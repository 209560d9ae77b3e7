"""Guard: the suite must run on 8 virtual CPU devices (see conftest)."""
import jax


def test_cpu_backend_with_8_devices():
    assert jax.default_backend() == "cpu"
    assert jax.device_count() == 8
