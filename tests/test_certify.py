"""Token-safety certificate: soundness property + behavior checks."""

import numpy as np

import jax
import jax.numpy as jnp

from audiocodecs_tpu.quant.certify import certify_rvq_tokens
from audiocodecs_tpu.quant.rvq import rvq_encode


def test_certificate_soundness_random():
    """Property: EVERY certified frame must produce identical tokens, for
    any perturbation of the certified norm — exercised with many random
    latent/perturbation draws."""
    rng = np.random.default_rng(0)
    K, C, H = 3, 32, 8
    codebooks = jnp.asarray(rng.standard_normal((K, C, H)), jnp.float32)
    violations = 0
    for trial in range(20):
        z = jnp.asarray(rng.standard_normal((4, 16, H)), jnp.float32)
        scale = 10.0 ** rng.uniform(-4, -0.5)
        z_fast = z + jnp.asarray(
            rng.standard_normal(z.shape) * scale, jnp.float32)
        cert, equal, delta = certify_rvq_tokens(z, z_fast, codebooks)
        t_exact = rvq_encode(z, codebooks)
        t_fast = rvq_encode(z_fast, codebooks)
        same = jnp.all(t_exact == t_fast, axis=-1)
        # soundness: certified ⇒ tokens identical
        violations += int(jnp.sum(cert & ~same))
        # `equal` tracks the observed agreement exactly
        np.testing.assert_array_equal(np.asarray(equal), np.asarray(same))
    assert violations == 0


def test_certificate_tightness_extremes():
    rng = np.random.default_rng(1)
    K, C, H = 2, 16, 8
    codebooks = jnp.asarray(rng.standard_normal((K, C, H)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((2, 8, H)), jnp.float32)
    # zero perturbation: everything certified and equal
    cert, equal, delta = certify_rvq_tokens(z, z, codebooks)
    assert bool(jnp.all(cert)) and bool(jnp.all(equal))
    assert float(jnp.max(delta)) == 0.0
    # huge perturbation: nothing certified
    cert2, _, _ = certify_rvq_tokens(
        z, z + 100.0, codebooks)
    assert not bool(jnp.any(cert2))


def test_dac_certificate_soundness_random():
    """Same soundness property for the projected-cosine (DAC) variant."""
    from audiocodecs_tpu.models.dac import dac_rvq_encode
    from audiocodecs_tpu.quant.certify import certify_dac_tokens

    rng = np.random.default_rng(2)
    K, H, D, C = 3, 16, 8, 32
    quantizers = []
    for k in range(K):
        quantizers.append({
            "in_proj": {"w": jnp.asarray(
                rng.standard_normal((1, H, D)) * H**-0.5, jnp.float32),
                "b": jnp.asarray(rng.standard_normal(D) * 0.1, jnp.float32)},
            "out_proj": {"w": jnp.asarray(
                rng.standard_normal((1, D, H)) * D**-0.5, jnp.float32),
                "b": jnp.asarray(rng.standard_normal(H) * 0.1, jnp.float32)},
            "codebook": jnp.asarray(rng.standard_normal((C, D)), jnp.float32),
        })
    violations = 0
    for trial in range(20):
        z = jnp.asarray(rng.standard_normal((2, 12, H)), jnp.float32)
        scale = 10.0 ** rng.uniform(-4, -0.5)
        z_fast = z + jnp.asarray(
            rng.standard_normal(z.shape) * scale, jnp.float32)
        cert, equal, _ = certify_dac_tokens(z, z_fast, quantizers)
        t_e = dac_rvq_encode(z, quantizers, K)
        t_f = dac_rvq_encode(z_fast, quantizers, K)
        same = np.all(np.asarray(t_e == t_f), axis=-1)
        violations += int(np.sum(cert & ~same))
        np.testing.assert_array_equal(np.asarray(equal), same)
    assert violations == 0


def test_mimi_certificate_soundness_random():
    """Soundness for the split-RVQ (Mimi) variant against the real
    _split_rvq_encode."""
    from audiocodecs_tpu.models.mimi import _split_rvq_encode
    from audiocodecs_tpu.quant.certify import certify_mimi_tokens

    rng = np.random.default_rng(3)
    H, D, C = 12, 8, 16
    q = {
        "semantic": {
            "in_proj": jnp.asarray(rng.standard_normal((H, D)) * H**-0.5,
                                   jnp.float32),
            "codebooks": jnp.asarray(rng.standard_normal((1, C, D)),
                                     jnp.float32),
        },
        "acoustic": {
            "in_proj": jnp.asarray(rng.standard_normal((H, D)) * H**-0.5,
                                   jnp.float32),
            "codebooks": jnp.asarray(rng.standard_normal((3, C, D)),
                                     jnp.float32),
        },
    }
    violations = 0
    for trial in range(20):
        emb = jnp.asarray(rng.standard_normal((2, 10, H)), jnp.float32)
        scale = 10.0 ** rng.uniform(-4, -0.5)
        emb_f = emb + jnp.asarray(
            rng.standard_normal(emb.shape) * scale, jnp.float32)
        cert, equal, _ = certify_mimi_tokens(emb, emb_f, q, 4, 1)
        t_e = _split_rvq_encode(q, emb, 4, 1)
        t_f = _split_rvq_encode(q, emb_f, 4, 1)
        same = np.all(np.asarray(t_e == t_f), axis=-1)
        violations += int(np.sum(np.asarray(cert) & ~same))
        np.testing.assert_array_equal(np.asarray(equal), same)
    assert violations == 0
