#!/usr/bin/env bash
# Full-suite runner: one pytest process per test module.
#
# Why not `pytest tests/`? The XLA CPU compiler can segfault inside
# `backend_compile_and_load` in a long-lived process after hundreds of
# prior compilations (observed twice on the 1-core CI box: once in a
# warp sweep, once compiling the BA lax.scan in test_slam — both tests
# pass deterministically in fresh processes). Per-module isolation also
# bounds the blast radius of any crash to one module's report.
#
# Usage: tests/run_suite.sh [extra pytest args...]
#        tests/run_suite.sh -m "not slow"     # fast tier, isolated
set -u
cd "$(dirname "$0")/.."
fail=0
for f in tests/test_*.py; do
    echo "=== $f"
    if [ "$f" = "tests/test_slam.py" ]; then
        # test_slam accumulates enough BA-scale lax.scan compilations
        # that the XLA-CPU segfault reproduces even within ONE module
        # run (observed round 5: TestGlobalBA crashes after two
        # sibling tests, passes solo) — isolate per test.
        for t in $(python -m pytest "$f" --collect-only -q \
                       -p no:cacheprovider "$@" 2>/dev/null \
                   | grep '::'); do
            echo "--- $t"
            python -m pytest "$t" -q -p no:cacheprovider
            rc=$?
            if [ $rc -ne 0 ] && [ $rc -ne 5 ]; then
                echo "!!! $t failed (exit $rc)"
                fail=1
            fi
        done
        continue
    fi
    python -m pytest "$f" -q -p no:cacheprovider "$@"
    rc=$?
    # pytest exit 5 = no tests collected (e.g. everything deselected)
    if [ $rc -ne 0 ] && [ $rc -ne 5 ]; then
        echo "!!! $f failed (exit $rc)"
        fail=1
    fi
done
exit $fail
