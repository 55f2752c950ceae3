"""Shared fixtures for the int8 Pallas kernel tests.

Originally lived in test_pallas_feature_block.py; that test file was
deleted with the fused-FeatureBlock kernel (DESIGN.md round-4 kernel-
shelf prune) but the pointwise/conv3 kernel tests still build their
synthetic feature blocks with these helpers.
"""

import jax.numpy as jnp
import numpy as np


def make_block(rng, c, reps):
    """Random params/batch_stats for a FeatureBlock: per rep a 1x1
    c->c/2 conv block and a 3x3 c/2->c conv block (reference
    model.py:41-48 shapes)."""
    p, bs = {}, {}
    for r in range(reps):
        for idx, (kh, ci, co) in ((2 * r, (1, c, c // 2)),
                                  (2 * r + 1, (3, c // 2, c))):
            p[f"ConvBlock_{idx}"] = {
                "Conv_0": {
                    "kernel": jnp.asarray(
                        rng.randn(kh, kh, ci, co).astype(np.float32) * 0.2),
                    "bias": jnp.asarray(
                        rng.randn(co).astype(np.float32) * 0.1),
                },
                "BatchNorm_0": {
                    "scale": jnp.asarray(
                        1.0 + 0.1 * rng.randn(co).astype(np.float32)),
                    "bias": jnp.asarray(
                        rng.randn(co).astype(np.float32) * 0.1),
                },
            }
            bs[f"ConvBlock_{idx}"] = {"BatchNorm_0": {
                "mean": jnp.asarray(rng.randn(co).astype(np.float32) * 0.1),
                "var": jnp.asarray(
                    (1.0 + 0.2 * rng.rand(co)).astype(np.float32)),
            }}
    return p, bs


def assert_quant_faithful(got, ref):
    """Wiring-exact up to borderline round() flips: XLA fuses the f32
    epilogues differently than the kernel (FMA contraction), which can
    flip values sitting exactly on a .5 quantization boundary. A wiring
    BUG mismatches ~100% of elements at output scale; boundary noise
    touches <<1% with sub-quant-step magnitude."""
    got = np.array(got, np.float32)
    ref = np.array(ref, np.float32)
    d = np.abs(got - ref)
    frac = float((d > 0).mean())
    assert frac <= 0.02, f"{frac:.2%} elements differ"
    assert d.max() <= 0.15 * ref.std() + 1e-6, (d.max(), ref.std())
    assert d.mean() <= 2e-3 * ref.std() + 1e-7, (d.mean(), ref.std())
