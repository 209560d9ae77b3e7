"""Native (C++) runtime components, loaded via ctypes.

The reference implements its runtime in native code (Rust + SIMD); the
TPU build keeps the same stance for host-side hot paths that neither XLA
nor numpy serve well: byte-granular codecs (RVL) and irregular
pointer-chasing algorithms (union-find CCL). Sources live next to this
file and are compiled on demand with g++ -O3; the result is cached in the
package directory keyed on source mtime. Every native entry point has a
pure-numpy fallback so the package works without a toolchain.
"""

from kornia_tpu.native.build import load_native_library, native_available

__all__ = ["load_native_library", "native_available"]
