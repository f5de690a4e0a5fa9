"""The package must force full-precision matmul passes unless the user chose
otherwise: bf16 default-precision passes make ~23% of fp32 Riccati solves go
non-finite on TPU (measured on v5e; see aligator_tpu/__init__.py). There is
no TPU in CI, so this guards the configuration, and the bench's
``frac_converged`` audit guards the numerics on hardware."""

import jax


def test_matmul_precision_default_is_highest():
    import aligator_tpu  # noqa: F401

    assert jax.config.jax_default_matmul_precision == "highest"
