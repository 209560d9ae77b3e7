"""Shared example plumbing: --cpu flag, default test images."""

from __future__ import annotations

import argparse
import os


DOG_JPEG = "/root/reference/tests/data/dog.jpeg"
APRILTAG_JPG = "/root/reference/tests/data/apriltags_tag36h11.jpg"


def base_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (skip the TPU tunnel)")
    return p


def configure_backend(args) -> None:
    """Must run before the first jax use."""
    n_mesh = getattr(args, "mesh", 0) or 0
    if n_mesh > 1 and not args.cpu:
        import jax

        if len(jax.devices()) < n_mesh:
            raise SystemExit(
                f"--mesh {n_mesh} needs {n_mesh} devices but only "
                f"{len(jax.devices())} are attached; add --cpu to run "
                f"on a virtual host mesh")
    if args.cpu:
        import jax

        if n_mesh > 1:
            # virtual host mesh: must land before the CPU client inits
            flags = os.environ.get("XLA_FLAGS", "")
            if "xla_force_host_platform_device_count" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags
                    + f" --xla_force_host_platform_device_count={n_mesh}"
                ).strip()
        jax.config.update("jax_platforms", "cpu")


def make_mesh(args):
    """Build the 1-axis device mesh requested by --mesh N (None if N<=1)."""
    n_mesh = getattr(args, "mesh", 0) or 0
    if n_mesh <= 1:
        return None
    import numpy as np
    import jax
    from jax.sharding import Mesh

    from kornia_tpu.parallel.mesh import OBS_AXIS

    return Mesh(np.asarray(jax.devices()[:n_mesh]), (OBS_AXIS,))
