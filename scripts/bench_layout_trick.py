#!/usr/bin/env python
"""Measure whether logical transposes around a pallas_call neutralize the
custom-call layout cascade (DESIGN.md round-2b negative result).

XLA's TPU conv emitter prefers {3,0,2,1} layouts for NHWC activations
(bytes ordered h, w, n, c); pallas_call pins operands/results to the
default row-major {3,2,1,0}. Round 2 measured the resulting relayout
copies + fusion splits at +1-3 ms per fused region. But a LOGICAL
transpose [B,H,W,C] -> [H,W,B,C] of a {3,0,2,1} tensor is byte-identical
to the default layout of the transposed shape — if XLA lowers it as a
bitcast, a kernel that operates on the [H,W,B,C] view gets conv-preferred
bytes in and out with zero copies.

Chains: s8 conv -> (bridge) -> s8 conv, where bridge is
  none      : epilogue stays XLA (baseline)
  pallas    : epilogue in a trivial [B,H,W,C] kernel (round-2 layout tax)
  pallas_t  : same kernel on the transposed [H,W,B,C] view

Run on TPU:  python scripts/bench_layout_trick.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    cache = os.path.expanduser("~/.cache/yolov3_tpu_xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B, H, W, C = 64, 32, 32, 512
    CO = 512
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randint(-127, 128, (B, H, W, C)), jnp.int8)
    w1 = jnp.asarray(rng.randint(-4, 5, (1, 1, C, CO)), jnp.int8)
    w2 = jnp.asarray(rng.randint(-4, 5, (1, 1, CO, C)), jnp.int8)
    dn = jax.lax.conv_dimension_numbers(x.shape, w1.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(t, w):
        return jax.lax.conv_general_dilated(
            t, w, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)

    def epilogue_xla(y):
        f = y.astype(jnp.float32) * 0.01
        f = jnp.where(f >= 0, f, 0.2 * f)
        return jnp.clip(jnp.round(f * 3.7), -127, 127).astype(jnp.int8)

    def _kernel(y_ref, o_ref):
        f = y_ref[...].astype(jnp.float32) * 0.01
        f = jnp.where(f >= 0, f, 0.2 * f)
        o_ref[...] = jnp.clip(jnp.round(f * 3.7), -127,
                              127).astype(jnp.int8)

    def epilogue_pallas(y):  # [B,H,W,C] blocks, default layouts
        return pl.pallas_call(
            _kernel,
            grid=(B,),
            in_specs=[pl.BlockSpec((1, H, W, CO), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, H, W, CO), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, W, CO), jnp.int8),
        )(y)

    def epilogue_pallas_t(y):  # operate on the [H,W,B,C] view
        yt = jnp.transpose(y, (1, 2, 0, 3))
        ot = pl.pallas_call(
            _kernel,
            grid=(H,),
            in_specs=[pl.BlockSpec((1, W, B, CO), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, W, B, CO), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W, B, CO), jnp.int8),
        )(yt)
        return jnp.transpose(ot, (2, 0, 1, 3))

    def make(bridge):
        @jax.jit
        def f(t):
            y = bridge(conv(t, w1))
            return conv(y, w2)
        return f

    # the whole chain as ONE kernel on the transposed view: 1x1 convs are
    # MXU matmuls over the flattened (W, B) block — measures whether a
    # hand matmul escapes the 32^2-stage conv-emitter tax entirely
    w1m = w1.reshape(C, CO)
    w2m = w2.reshape(CO, C)
    mm = (((1,), (0,)), ((), ()))

    def _mm_kernel(x_ref, w1_ref, w2_ref, o_ref):
        xb = x_ref[...].reshape(W * B, C)
        y = jax.lax.dot_general(xb, w1_ref[...], mm,
                                preferred_element_type=jnp.int32)
        f = y.astype(jnp.float32) * 0.01
        f = jnp.where(f >= 0, f, 0.2 * f)
        q = jnp.clip(jnp.round(f * 3.7), -127, 127).astype(jnp.int8)
        o = jax.lax.dot_general(q, w2_ref[...], mm,
                                preferred_element_type=jnp.int32)
        o_ref[...] = o.reshape(1, W, B, C)

    @jax.jit
    def pallas_mm(t):
        tt = jnp.transpose(t, (1, 2, 0, 3))
        ot = pl.pallas_call(
            _mm_kernel,
            grid=(H,),
            in_specs=[
                pl.BlockSpec((1, W, B, C), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, CO), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((CO, C), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, W, B, C), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, W, B, C), jnp.int32),
        )(tt, w1m, w2m)
        return jnp.transpose(ot, (2, 0, 1, 3))

    fns = {"xla": make(epilogue_xla),
           "pallas": make(epilogue_pallas),
           "pallas_t": make(epilogue_pallas_t),
           "pallas_mm": pallas_mm}

    # correctness cross-check: the two kernel paths must agree exactly;
    # vs XLA allow the .5-quantization-boundary flips from differing f32
    # contraction (<0.1% of elements)
    outs = {k: np.asarray(jax.device_get(f(x))) for k, f in fns.items()}
    np.testing.assert_array_equal(outs["pallas"], outs["pallas_t"])
    for k in ("xla", "pallas_mm"):
        frac = (outs["pallas"] != outs[k]).mean()
        assert frac < 1e-3, (k, frac)

    for name, f in fns.items():
        jax.device_get(f(x)[0, 0, 0, :2])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = None
            for _ in range(30):
                out = f(x)
            jax.device_get(out[0, 0, 0, :2])
            best = min(best, (time.perf_counter() - t0) / 30)
        hlo = f.lower(x).compile().as_text()
        ncopy = sum(1 for l in hlo.splitlines() if " copy(" in l)
        ntrans = sum(1 for l in hlo.splitlines() if " transpose(" in l)
        nbit = sum(1 for l in hlo.splitlines() if " bitcast" in l)
        print(f"{name:9s} {best * 1e3:7.3f} ms   copies={ncopy} "
              f"transposes={ntrans} bitcasts={nbit}", flush=True)


if __name__ == "__main__":
    main()
