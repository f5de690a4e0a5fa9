"""Matmul-precision policy guards (see aligator_tpu/_precision.py).

bf16 default-precision passes make ~23% of fp32 Riccati solves go
non-finite on TPU (measured on v5e), and 'high' (3-pass) loses ~100× KKT
accuracy inside the μ-scaled recursion. There is no TPU in CI, so these
guard the configuration; the bench's ``frac_converged`` audit guards the
numerics on hardware."""

import jax
import jax.numpy as jnp


def test_global_default_is_high():
    import aligator_tpu  # noqa: F401

    assert jax.config.jax_default_matmul_precision == "high"


def test_gar_core_pins_highest():
    """The decorated numeric core must trace its matmuls with fp32 passes
    even under a lower global default."""
    from aligator_tpu._precision import highest_precision

    captured = {}

    @highest_precision
    def probe(a, b):
        captured["prec"] = jax.config.jax_default_matmul_precision
        return a @ b

    with jax.default_matmul_precision("bfloat16"):
        probe(jnp.eye(3), jnp.eye(3))
    assert captured["prec"] == "highest"

    from aligator_tpu.gar import riccati

    assert riccati.backward.__wrapped__ is not riccati.backward
