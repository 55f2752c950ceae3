#!/usr/bin/env python
"""Microbenchmarks for the hot conv blocks on the real TPU.

Each variant is a shape-preserving step chained INSIDE one program with
lax.fori_loop (output feeds the next input), so the measurement reflects
real device execution — back-to-back identical host dispatches were observed
to report above-peak rates through the remote tunnel.

Shapes from the 512^2 b32 profile hot spots (see DESIGN.md):
- stage-2 1x1 256<->128 pair and 3x3 128<->256 pair
- full stage-2 residual rep (1x1 + 3x3 + affine epilogues + residual)
- S2D exit conv [2,2,256,128] (+ closing 1x1 to re-expand, measured alone)
- S2D stem2 "stays" vs exit+reblock
- int8 vs bf16 rate probe at stage-4

  python scripts/bench_blocks.py [--inner 20] [--outer 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--inner", type=int, default=20)
    p.add_argument("--outer", type=int, default=5)
    p.add_argument("--only", type=str, default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.expanduser("~/.cache/yolov3_tpu_xla_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from yolov3_tpu.models import yolo as Y

    rng = np.random.RandomState(0)
    results = {}
    B = 32
    bf = jnp.bfloat16
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(x, w, stride=1, padding="SAME"):
        return jax.lax.conv_general_dilated(
            x, jnp.asarray(w).astype(x.dtype), (stride, stride), padding,
            dimension_numbers=dn)

    def bench(name, step, x0, gflops_per_step=None):
        """step: x -> x (shape/dtype preserving), chained inner times.

        Timed by jax.device_get of a tiny end-of-program slice — the only
        reliable completion signal through the remote tunnel (CLAUDE.md
        measurement gotcha; block_until_ready returns early on repeat calls).
        """
        if args.only and name not in args.only.split(","):
            return

        @jax.jit
        def run(x):
            y = jax.lax.fori_loop(0, args.inner, lambda i, a: step(a), x)
            return jnp.ravel(y)[:4].astype(jnp.float32)

        x = jnp.asarray(x0)
        jax.device_get(run(x))
        best = float("inf")
        for _ in range(args.outer):
            t0 = time.perf_counter()
            jax.device_get(run(x))
            best = min(best, time.perf_counter() - t0)
        ms = best / args.inner * 1e3
        results[name] = ms
        rate = f"  {gflops_per_step / ms:7.1f} TF/s" if gflops_per_step else ""
        print(f"{name:44s} {ms:8.3f} ms{rate}", flush=True)

    # ---- stage-2: [32,64,64,256]; pair 256->128->256 (1x1) ----
    w1a = (rng.randn(1, 1, 256, 128) * 0.05).astype(np.float32)
    w1b = (rng.randn(1, 1, 128, 256) * 0.05).astype(np.float32)
    x2 = (rng.randn(B, 64, 64, 256) * 0.1).astype(np.float32)

    bench("s2_1x1_pair_conv", lambda x: conv(conv(x, w1a), w1b),
          x2.astype(np.float32), gflops_per_step=2 * 8.59)

    def dot1x1(x, w):
        n, h, wd, c = x.shape
        w = jnp.asarray(w).reshape(w.shape[2], w.shape[3]).astype(x.dtype)
        y = jnp.dot(x.reshape(-1, c), w, preferred_element_type=x.dtype)
        return y.reshape(n, h, wd, w.shape[-1])

    bench("s2_1x1_pair_dot", lambda x: dot1x1(dot1x1(x, w1a), w1b), x2,
          gflops_per_step=2 * 8.59)
    bench("s2_1x1_pair_conv_bf16",
          lambda x: conv(conv(x, w1a), w1b), x2.astype(bf),
          gflops_per_step=2 * 8.59)

    # 3x3 pair 128->256->128
    w3a = (rng.randn(3, 3, 128, 256) * 0.02).astype(np.float32)
    w3b = (rng.randn(3, 3, 256, 128) * 0.02).astype(np.float32)
    x2h = (rng.randn(B, 64, 64, 128) * 0.1).astype(np.float32)
    bench("s2_3x3_pair_conv_bf16",
          lambda x: conv(conv(x, w3a), w3b), x2h.astype(bf),
          gflops_per_step=2 * 77.3)

    # full residual rep (inference math), bf16 in/out
    sc1 = rng.rand(128).astype(np.float32) + 0.5
    of1 = rng.randn(128).astype(np.float32) * 0.1
    sc3 = rng.rand(256).astype(np.float32) + 0.5
    of3 = rng.randn(256).astype(np.float32) * 0.1

    def rep_xla(x):
        y = conv(x, w1a)
        y = jax.nn.leaky_relu(y, 0.2) * jnp.asarray(sc1, bf) + jnp.asarray(of1, bf)
        y = conv(y, w3a)
        y = jax.nn.leaky_relu(y, 0.2) * jnp.asarray(sc3, bf) + jnp.asarray(of3, bf)
        return (x + y) / jnp.asarray(2.0, bf)  # keep magnitudes bounded

    bench("s2_rep_xla_bf16", rep_xla, (x2 * 0.1).astype(bf),
          gflops_per_step=8.59 + 77.3)

    def rep_dot(x):
        y = dot1x1(x, w1a)
        y = jax.nn.leaky_relu(y, 0.2) * jnp.asarray(sc1, bf) + jnp.asarray(of1, bf)
        y = conv(y, w3a)
        y = jax.nn.leaky_relu(y, 0.2) * jnp.asarray(sc3, bf) + jnp.asarray(of3, bf)
        return (x + y) / jnp.asarray(2.0, bf)

    bench("s2_rep_dot1x1_bf16", rep_dot, (x2 * 0.1).astype(bf),
          gflops_per_step=8.59 + 77.3)

    # ---- S2D exit: [32,128,128,256] -> [32,128,128,128]; close with 1x1 up
    k_exit = (rng.randn(3, 3, 64, 128) * 0.05).astype(np.float32)
    wup = (rng.randn(1, 1, 128, 256) * 0.05).astype(np.float32)
    xb = (rng.randn(B, 128, 128, 256) * 0.1).astype(np.float32)

    # closing 1x1 alone (to subtract): 128->256 at 128^2 = 34.4 GF
    bench("close_1x1_128to256_bf16",
          lambda x: dot1x1(dot1x1(x, (rng.randn(1, 1, 256, 128) * 0.05
                                      ).astype(np.float32)), wup),
          xb.astype(bf), gflops_per_step=2 * 34.4)

    import functools

    def exit_blocked(x):
        k = Y._s2d_kernel_stride2_exit(jnp.asarray(k_exit))
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), ((0, 1), (0, 1)),
            dimension_numbers=dn)
        return dot1x1(y, wup) / jnp.asarray(4.0, bf)

    bench("exit_s2d_conv22+close", exit_blocked, xb.astype(bf),
          gflops_per_step=137.4 + 34.4)

    def exit_im2col(x):
        k = Y._s2d_kernel_stride2_exit(jnp.asarray(k_exit))  # [2,2,256,128]
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        n, h, wd, c = x.shape
        win = jnp.concatenate([
            xp[:, 0:h, 0:wd], xp[:, 0:h, 1:wd + 1],
            xp[:, 1:h + 1, 0:wd], xp[:, 1:h + 1, 1:wd + 1]], axis=-1)
        km = k.reshape(4 * c, 128).astype(x.dtype)
        y = jnp.dot(win.reshape(-1, 4 * c), km,
                    preferred_element_type=x.dtype).reshape(n, h, wd, 128)
        return dot1x1(y, wup) / jnp.asarray(4.0, bf)

    bench("exit_im2col_dot+close", exit_im2col, xb.astype(bf),
          gflops_per_step=137.4 + 34.4)

    def exit_d2s(x):
        n, h, wd, c = x.shape
        cu = c // 4
        xu = x.reshape(n, h, wd, 2, 2, cu).transpose(0, 1, 3, 2, 4, 5)
        xu = xu.reshape(n, 2 * h, 2 * wd, cu)
        y = jax.lax.conv_general_dilated(
            xu, jnp.asarray(k_exit).astype(x.dtype), (2, 2), "SAME",
            dimension_numbers=dn)
        return dot1x1(y, wup) / jnp.asarray(4.0, bf)

    bench("exit_d2s_conv+close", exit_d2s, xb.astype(bf),
          gflops_per_step=77.3 + 34.4)

    # ---- stem2 stays vs exit+reblock: [32,256,256,128] -> [32,128,128,256]
    k_stem2 = (rng.randn(3, 3, 32, 64) * 0.05).astype(np.float32)
    wdown = (rng.randn(1, 1, 256, 128) * 0.05).astype(np.float32)
    xs1 = (rng.randn(B, 256, 256, 128) * 0.1).astype(np.float32)

    def stem2_stays(x):
        k = Y._s2d_kernel_stride2_stay(jnp.asarray(k_stem2))
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (2, 2), ((0, 1), (0, 1)),
            dimension_numbers=dn)
        # close: 1x1 256->128 then 2x nearest upsample back to 256^2
        y = dot1x1(y, wdown) / jnp.asarray(4.0, bf)
        return Y.upsample_2x(y)

    bench("stem2_stays+close", stem2_stays, xs1.astype(bf),
          gflops_per_step=309.2 + 8.6)

    def stem2_exit_reblock(x):
        k = Y._s2d_kernel_stride2_exit(jnp.asarray(k_stem2))  # [2,2,128,64]
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), ((0, 1), (0, 1)),
            dimension_numbers=dn)
        y = Y.space_to_depth(y)
        y = dot1x1(y, wdown) / jnp.asarray(4.0, bf)
        return Y.upsample_2x(y)

    bench("stem2_exit_reblock+close", stem2_exit_reblock, xs1.astype(bf),
          gflops_per_step=137.4 + 8.6)

    # ---- int8 vs bf16 rate probe, stage-4: [32,16,16,512] 3x3 512<->1024
    w4a = rng.randint(-20, 20, (3, 3, 512, 1024)).astype(np.int8)
    w4b = rng.randint(-20, 20, (3, 3, 1024, 512)).astype(np.int8)
    xi = rng.randint(-4, 4, (B, 16, 16, 512)).astype(np.int8)

    def step_int8(x):
        y = jax.lax.conv_general_dilated(
            x, jnp.asarray(w4a), (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        y = (y // 1024).astype(jnp.int8)
        z = jax.lax.conv_general_dilated(
            y, jnp.asarray(w4b), (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.int32)
        return (z // 1024).astype(jnp.int8)

    bench("s4_3x3_pair_int8", step_int8, xi, gflops_per_step=2 * 77.3)

    w4af = (rng.randn(3, 3, 512, 1024) * 0.02).astype(np.float32)
    w4bf = (rng.randn(3, 3, 1024, 512) * 0.02).astype(np.float32)
    x4 = (rng.randn(B, 16, 16, 512) * 0.1).astype(np.float32)
    bench("s4_3x3_pair_bf16",
          lambda x: conv(conv(x, w4af), w4bf) / jnp.asarray(30.0, bf),
          x4.astype(bf), gflops_per_step=2 * 77.3)

    print("\nsummary (ms, sorted):")
    for k, v in sorted(results.items(), key=lambda kv: kv[1]):
        print(f"  {k:40s} {v:8.3f}")


if __name__ == "__main__":
    main()
