#!/usr/bin/env python
"""Isolate the transposed-view pointwise (1x1) Pallas kernel's throughput.

Variants probe where time goes at the [64,32,32,512] (FB3-like) shape:
rows-per-block, epilogue on/off, output dtype, int8 vs bf16 matmul.
All run in one process (one tunnel session, cached compiles amortized).

Run on TPU:  python scripts/bench_pointwise_kernel.py
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

    B, H, W, C, CO = 64, 32, 32, 512, 256
    rng = np.random.RandomState(0)
    xt = jnp.asarray(rng.randint(-127, 128, (H, W, B, C)), jnp.int8)
    wm = jnp.asarray(rng.randint(-4, 5, (C, CO)), jnp.int8)
    epi = jnp.asarray(rng.rand(4, CO), jnp.float32)
    mm = (((1,), (0,)), ((), ()))

    def make(rows, epilogue, out_dtype):
        m = rows * W * B

        def kernel(x_ref, w_ref, e_ref, o_ref):
            xb = x_ref[...].reshape(m, C)
            y = jax.lax.dot_general(xb, w_ref[...], mm,
                                    preferred_element_type=jnp.int32)
            if epilogue:
                f = y.astype(jnp.float32) * e_ref[0, :] + e_ref[1, :]
                f = jnp.where(f >= 0, f, 0.2 * f)
                f = f * e_ref[2, :] + e_ref[3, :]
                f = f.astype(jnp.bfloat16).astype(jnp.float32)
                y = jnp.clip(jnp.round(f * 1.7), -127, 127)
            o_ref[...] = y.astype(o_ref.dtype).reshape(rows, W, B, CO)

        @jax.jit
        def f(t):
            return pl.pallas_call(
                kernel,
                grid=(H // rows,),
                in_specs=[
                    pl.BlockSpec((rows, W, B, C),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((C, CO), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((4, CO), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((rows, W, B, CO),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((H, W, B, CO), out_dtype),
            )(t, wm, epi)
        return f

    def bench(name, f, x):
        jax.device_get(f(x)[0, 0, 0, :2])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = None
            for _ in range(50):
                out = f(x)
            jax.device_get(out[0, 0, 0, :2])
            best = min(best, (time.perf_counter() - t0) / 50)
        print(f"{name:28s} {best * 1e3:7.3f} ms", flush=True)

    # traffic floor: in 33.5 MB + out s8 16.7 MB ~ 0.06 ms; compute
    # 2*64*1024*512*256*2 = 34 GOP ~ 0.09 ms at 394 TOPS int8 / 0.17 bf16
    bench("mm only s32 rows=1", make(1, False, jnp.int32), xt)
    bench("mm only s8 rows=1", make(1, False, jnp.int8), xt)

    # same matmul but bf16 x bf16 -> f32 (the non-quantized MXU rate)
    def make_bf16mm(rows):
        m = rows * W * B

        def kernel(x_ref, w_ref, e_ref, o_ref):
            xb = x_ref[...].reshape(m, C)
            y = jax.lax.dot_general(xb, w_ref[...], mm,
                                    preferred_element_type=jnp.float32)
            o_ref[...] = y.astype(jnp.bfloat16).reshape(rows, W, B, CO)

        @jax.jit
        def f(t):
            return pl.pallas_call(
                kernel,
                grid=(H // rows,),
                in_specs=[
                    pl.BlockSpec((rows, W, B, C), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((C, CO), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((4, CO), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((rows, W, B, CO),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((H, W, B, CO), jnp.bfloat16),
            )(t.astype(jnp.bfloat16), wm.astype(jnp.bfloat16), epi)
        return f

    bench("mm only bf16 rows=1", make_bf16mm(1), xt)

    # epilogue only (no matmul): the VPU-side cost in isolation
    def make_epi_only(rows):
        def kernel(x_ref, e_ref, o_ref):
            y = x_ref[...].reshape(rows * W * B, C).astype(jnp.float32)
            f = y * e_ref[0, :C] + e_ref[1, :C]
            f = jnp.where(f >= 0, f, 0.2 * f)
            f = f * e_ref[2, :C] + e_ref[3, :C]
            f = f.astype(jnp.bfloat16).astype(jnp.float32)
            o_ref[...] = jnp.clip(jnp.round(f * 1.7), -127,
                                  127).astype(jnp.int8).reshape(
                                      rows, W, B, C)

        epi_c = jnp.asarray(rng.rand(4, C), jnp.float32)

        @jax.jit
        def f(t):
            return pl.pallas_call(
                kernel,
                grid=(H // rows,),
                in_specs=[
                    pl.BlockSpec((rows, W, B, C), lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((4, C), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((rows, W, B, C),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((H, W, B, C), jnp.int8),
            )(t, epi_c)
        return f

    bench("epi only rows=1", make_epi_only(1), xt)

    for rows in (1, 2):
        bench(f"mm+epi s8 rows={rows}", make(rows, True, jnp.int8), xt)

    # bf16 input variant (quantize inside)
    xbf = xt.astype(jnp.bfloat16)

    def make_bf(rows):
        m = rows * W * B

        def kernel(x_ref, w_ref, e_ref, o_ref):
            xb = x_ref[...].reshape(m, C).astype(jnp.float32)
            q = jnp.clip(jnp.round(xb * 0.43), -127, 127).astype(jnp.int8)
            y = jax.lax.dot_general(q, w_ref[...], mm,
                                    preferred_element_type=jnp.int32)
            f = y.astype(jnp.float32) * e_ref[0, :] + e_ref[1, :]
            f = jnp.where(f >= 0, f, 0.2 * f)
            f = f * e_ref[2, :] + e_ref[3, :]
            f = f.astype(jnp.bfloat16).astype(jnp.float32)
            o_ref[...] = jnp.clip(jnp.round(f * 1.7), -127,
                                  127).astype(jnp.int8).reshape(
                                      rows, W, B, CO)

        @jax.jit
        def f(t):
            return pl.pallas_call(
                kernel,
                grid=(H // rows,),
                in_specs=[
                    pl.BlockSpec((rows, W, B, C),
                                 lambda i: (i, 0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((C, CO), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((4, CO), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((rows, W, B, CO),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((H, W, B, CO), jnp.int8),
            )(t, wm, epi)
        return f

    for rows in (1, 2):
        bench(f"bf16-in q+mm+epi rows={rows}", make_bf(rows), xbf)


if __name__ == "__main__":
    main()
