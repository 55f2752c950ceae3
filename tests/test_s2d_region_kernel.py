"""FULL fused S2D region kernel (stem2 -> pw -> 3x3 -> residual -> exit,
scratch-carried band pipeline) vs the XLA mirror.

CPU tests run the kernel in Pallas interpreter mode; the compiled path is
exercised on TPU by scripts/bench_int8.py (int8_regionfull variant).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolov3_tpu.config import ModelConfig
from yolov3_tpu.models import quantized as Q
from yolov3_tpu.models.yolo import YoloV3


def make_model(img=64, dtype="float32"):
    cfg = ModelConfig(img_size=(img, img, 3), number_classes=2,
                      anchors=((8, 16), (16, 8)), compute_dtype=dtype)
    m = YoloV3(cfg)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)),
               train=False)
    return cfg, v["params"], v["batch_stats"]


def region_pair(img=64, dtype="float32", b=2, seed=0):
    """(kernel-path s8 region output, mirror region output quantized with
    the same scale) on one set of random weights/images."""
    cfg, params, batch_stats = make_model(img, dtype)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, img, img, 3).astype(np.float32))
    scales = Q.calibrate(params, batch_stats, cfg, x)

    ref_ctx = Q._Ctx(cfg, act_scales=scales)
    ref = Q._s2d_region(ref_ctx, params, batch_stats,
                        x.astype(jnp.float32))
    assert ref.dtype != jnp.int8
    s5 = scales["Darknet53_0/FeatureBlock_1/ConvBlock_0"]
    ref_q = Q._quantize_act(ref, jnp.float32(s5))

    got_ctx = Q._Ctx(cfg, act_scales=scales, region_full=True,
                     fused_interpret=True)
    got_q = Q._s2d_region(got_ctx, params, batch_stats,
                          x.astype(jnp.float32))
    assert got_q.dtype == jnp.int8, "full region kernel did not engage"
    return got_q, ref_q


def assert_quant_close(got, ref, frac=0.06):
    """Same .5-quantization-boundary tolerance class as the other int8
    kernels: s8 codes may differ by 1 where an f32 epilogue lands exactly
    on a rounding boundary (one extra quantized stage vs the tail kernel,
    slightly higher flip budget)."""
    got = np.asarray(got, np.int32)
    ref = np.asarray(ref, np.int32)
    d = np.abs(got - ref)
    assert d.max() <= 1, (d.max(), (d > 0).mean())
    assert (d > 0).mean() <= frac, (d > 0).mean()


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_region_full_matches_mirror(dtype):
    got, ref = region_pair(dtype=dtype)
    assert got.shape == ref.shape
    assert_quant_close(got, ref)


def test_multiband_grid():
    """H=32 region (128px input): several row bands, the cross-band
    scratch carry, and both edge masks."""
    got, ref = region_pair(img=128, seed=3)
    assert_quant_close(got, ref)


def test_batch_tiles_reinitialize_carry():
    """b=16 with bt=8 -> two batch tiles; the jh==0 prologue must reset
    the scratch carry at the second tile or its top rows read the first
    tile's bottom state."""
    got, ref = region_pair(img=64, b=16, seed=7)
    assert_quant_close(got, ref)


def test_fast_epilogue_close_to_exact():
    """The folded fast epilogue (requant 1/s pre-folded into the affine,
    max-form leaky, no bf16 roundtrips) may differ from the exact mode
    only by small quantization-boundary flips: the exact mode's bf16
    casts are themselves ~0.4%-relative rounding, so codes can move by
    1 (2 at the extreme of the s8 range where bf16 ulp is ~0.5 code)."""
    cfg, params, batch_stats = make_model()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    scales = Q.calibrate(params, batch_stats, cfg, x)
    exact = Q._s2d_region(
        Q._Ctx(cfg, act_scales=scales, region_full=True,
               fused_interpret=True), params, batch_stats, x)
    fast = Q._s2d_region(
        Q._Ctx(cfg, act_scales=scales, region_full=True, region_fast=True,
               fused_interpret=True), params, batch_stats, x)
    assert exact.dtype == jnp.int8 and fast.dtype == jnp.int8
    d = np.abs(np.asarray(exact, np.int32) - np.asarray(fast, np.int32))
    assert d.max() <= 2, d.max()
    assert (d > 0).mean() <= 0.25, (d > 0).mean()


def test_affine2_close_to_exact():
    """The 2-affine epilogue (max of two FMA'd affines, negative-mul
    channels sign-compensated through the consuming weights) is the same
    divergence class as the fast mode: <=2 codes on rounding
    boundaries."""
    cfg, params, batch_stats = make_model()
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    scales = Q.calibrate(params, batch_stats, cfg, x)
    exact = Q._s2d_region(
        Q._Ctx(cfg, act_scales=scales, region_full=True,
               fused_interpret=True), params, batch_stats, x)
    a2 = Q._s2d_region(
        Q._Ctx(cfg, act_scales=scales, region_full=True,
               region_affine2=True, fused_interpret=True),
        params, batch_stats, x)
    assert exact.dtype == jnp.int8 and a2.dtype == jnp.int8
    d = np.abs(np.asarray(exact, np.int32) - np.asarray(a2, np.int32))
    assert d.max() <= 2, d.max()
    assert (d > 0).mean() <= 0.25, (d > 0).mean()


def test_affine2_negative_mul_channels():
    """Negative BN scales flip the leaky max into a min; the packing
    negates those channels' coefficients and compensates in the consuming
    weights' input channels (+ the residual row). Force negatives in all
    three 2-affine stages and check against the plain mirror."""
    cfg, params, batch_stats = make_model()
    d = params["Darknet53_0"]
    for blk in (d["ConvBlock_1"], d["FeatureBlock_0"]["ConvBlock_0"],
                d["FeatureBlock_0"]["ConvBlock_1"]):
        sc = blk["BatchNorm_0"]["scale"]
        flip = (jnp.arange(sc.shape[0]) % 3 == 0)
        blk["BatchNorm_0"]["scale"] = jnp.where(flip, -sc, sc)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    scales = Q.calibrate(params, batch_stats, cfg, x)
    ref = Q._s2d_region(
        Q._Ctx(cfg, act_scales=scales, region_full=True,
               fused_interpret=True), params, batch_stats, x)
    a2 = Q._s2d_region(
        Q._Ctx(cfg, act_scales=scales, region_full=True,
               region_affine2=True, fused_interpret=True),
        params, batch_stats, x)
    dd = np.abs(np.asarray(ref, np.int32) - np.asarray(a2, np.int32))
    assert dd.max() <= 2, dd.max()
    assert (dd > 0).mean() <= 0.25, (dd > 0).mean()


def test_full_model_region_fast():
    """End-to-end fast-mode consistency against the plain int8 mirror."""
    cfg, params, batch_stats = make_model()
    rng = np.random.RandomState(13)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    scales = Q.calibrate(params, batch_stats, cfg, x)
    ref = Q.forward_feature_maps(params, batch_stats, cfg, x,
                                 act_scales=scales)
    got = Q.forward_feature_maps(params, batch_stats, cfg, x,
                                 act_scales=scales, region_full=True,
                                 region_fast=True, fused_interpret=True)
    for a, b in zip(got, ref):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        d = np.abs(a - b)
        assert d.max() <= 0.15 * b.std() + 1e-6, (d.max(), b.std())


def test_region_kernel_engages():
    """The fused path must actually route (no silent fallback)."""
    cfg, params, batch_stats = make_model()
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    scales = Q.calibrate(params, batch_stats, cfg, x)

    def f(images):
        return Q.forward_feature_maps(params, batch_stats, cfg, images,
                                      act_scales=scales,
                                      region_full=True,
                                      fused_interpret=True)

    text = str(jax.make_jaxpr(f)(x))
    assert text.count("s2d_region") == 1, text.count("s2d_region")


def test_fallback_when_uncalibrated():
    """With stem2 skip-listed the fused path must fall back to the per-op
    mirror (bf16/f32 region output, not s8)."""
    cfg, params, batch_stats = make_model()
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    scales = Q.calibrate(params, batch_stats, cfg, x)
    skip = Q.DEFAULT_QUANT_SKIP + ("Darknet53_0/ConvBlock_1",)
    ctx = Q._Ctx(cfg, act_scales=scales, quant_skip=skip,
                 region_full=True, fused_interpret=True)
    out = Q._s2d_region(ctx, params, batch_stats, x)
    assert out.dtype != jnp.int8


def rawin_pair(img=64, b=2, seed=0, dtype="float32", fast=False,
               budget=None, monkeypatch=None):
    """(rawin-kernel s8 region output, s8-input-kernel output) with an
    engagement assertion: the rawin call must actually route (the s8
    fallback would be trivially bit-equal)."""
    import yolov3_tpu.ops.pallas.s2d_region_kernel as K

    cfg, params, batch_stats = make_model(img, dtype)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, img, img, 3).astype(np.float32))
    scales = Q.calibrate(params, batch_stats, cfg, x)

    if budget is not None and monkeypatch is not None:
        monkeypatch.setattr(K, "_VMEM_BUDGET", budget)
    ref = Q._s2d_region(
        Q._Ctx(cfg, act_scales=scales, region_full=True, region_fast=fast,
               fused_interpret=True), params, batch_stats, x)

    seen = []
    orig = Q._s2d_region_fused

    def spy(ctx, p, bs, conv_in, rawin=False):
        seen.append((rawin, conv_in.dtype))
        return orig(ctx, p, bs, conv_in, rawin=rawin)

    Q._s2d_region_fused = spy
    try:
        got = Q._s2d_region(
            Q._Ctx(cfg, act_scales=scales, region_full=True,
                   region_rawin=True, region_fast=fast,
                   fused_interpret=True), params, batch_stats, x)
    finally:
        Q._s2d_region_fused = orig
    assert seen and seen[0][0], "rawin path fell back to the s8 kernel"
    assert seen[0][1] != jnp.int8
    assert got.dtype == jnp.int8 and ref.dtype == jnp.int8
    return got, ref


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_rawin_bit_identical(dtype):
    """The rawin kernel (stem1's raw bf16/f32 output quantized in-VMEM)
    must be BIT-identical to the s8-input kernel: the in-kernel quantize
    replicates _quantize_act's exact op sequence and every later stage is
    unchanged."""
    got, ref = rawin_pair(dtype=dtype)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_rawin_multiband_and_batch_tiles():
    """Several row bands (the extra carry-init band 0 + the shifted out
    blocks) and two batch tiles (carry re-init at the second tile)."""
    got, ref = rawin_pair(img=128, b=16, seed=7)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_rawin_fast_epilogue():
    got, ref = rawin_pair(seed=2, fast=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_rawin_ro2_plan(monkeypatch):
    """The shipping 512px shape plans ro=2; force the ro=2 band geometry
    (band-0 halo row carries input row 4) on the toy shape."""
    got, ref = rawin_pair(img=128, seed=5, budget=2 * 1024 * 1024,
                          monkeypatch=monkeypatch)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_full_model_region_rawin():
    """forward_feature_maps with region_rawin == plain int8 mirror on a
    small end-to-end model."""
    cfg, params, batch_stats = make_model()
    rng = np.random.RandomState(17)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    scales = Q.calibrate(params, batch_stats, cfg, x)
    ref = Q.forward_feature_maps(params, batch_stats, cfg, x,
                                 act_scales=scales)
    got = Q.forward_feature_maps(params, batch_stats, cfg, x,
                                 act_scales=scales, region_full=True,
                                 region_rawin=True, region_fast=True,
                                 fused_interpret=True)
    for a, b in zip(got, ref):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        d = np.abs(a - b)
        assert d.max() <= 0.15 * b.std() + 1e-6, (d.max(), b.std())


def test_full_model_region_full():
    """forward_feature_maps with region_full == plain int8 mirror on a
    small end-to-end model (downstream blocks consume the s8 handoff)."""
    cfg, params, batch_stats = make_model()
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    scales = Q.calibrate(params, batch_stats, cfg, x)
    ref = Q.forward_feature_maps(params, batch_stats, cfg, x,
                                 act_scales=scales)
    got = Q.forward_feature_maps(params, batch_stats, cfg, x,
                                 act_scales=scales, region_full=True,
                                 fused_interpret=True)
    for a, b in zip(got, ref):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        d = np.abs(a - b)
        assert d.max() <= 0.15 * b.std() + 1e-6, (d.max(), b.std())


def rawimg_pair(img=64, b=2, seed=0, dtype="float32", fast=False,
                budget=None, monkeypatch=None):
    """(rawimg-kernel s8 region output, s8-input-kernel output) with an
    engagement assertion. NOT bit-identical by contract: stem1 runs as
    the kernel's [9*4ci]-K lifted matmul vs the mirror's XLA conv, so
    float-association noise can flip codes sitting exactly on a rounding
    boundary — same <=1-code class as the other fused stages."""
    import yolov3_tpu.ops.pallas.s2d_region_kernel as K

    cfg, params, batch_stats = make_model(img, dtype)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, img, img, 3).astype(np.float32))
    scales = Q.calibrate(params, batch_stats, cfg, x)

    if budget is not None and monkeypatch is not None:
        monkeypatch.setattr(K, "_VMEM_BUDGET", budget)
    ref = Q._s2d_region(
        Q._Ctx(cfg, act_scales=scales, region_full=True, region_fast=fast,
               fused_interpret=True), params, batch_stats, x)

    seen = []
    orig = Q._s2d_region_fused

    def spy(ctx, p, bs, conv_in, rawin=False, rawimg=False):
        seen.append((rawimg, conv_in.shape[-1]))
        return orig(ctx, p, bs, conv_in, rawin=rawin, rawimg=rawimg)

    Q._s2d_region_fused = spy
    try:
        got = Q._s2d_region(
            Q._Ctx(cfg, act_scales=scales, region_full=True,
                   region_rawimg=True, region_fast=fast,
                   fused_interpret=True), params, batch_stats, x)
    finally:
        Q._s2d_region_fused = orig
    assert seen and seen[0][0], "rawimg path fell back"
    assert seen[0][1] == 3, "rawimg must consume the image itself"
    assert got.dtype == jnp.int8 and ref.dtype == jnp.int8
    return got, ref


@pytest.mark.parametrize("dtype", ["float32", "bfloat16"])
def test_rawimg_matches_s8_kernel(dtype):
    got, ref = rawimg_pair(dtype=dtype)
    assert got.shape == ref.shape
    assert_quant_close(got, ref, frac=0.10)


def test_rawimg_multiband_and_batch_tiles():
    """Several row bands (extra carry-init band 0, the cross-band x-row
    scratch carry) and two batch tiles (x carry re-init at tile 2)."""
    got, ref = rawimg_pair(img=128, b=16, seed=7)
    assert_quant_close(got, ref, frac=0.10)


def test_rawimg_fast_epilogue():
    got, ref = rawimg_pair(seed=2, fast=True)
    assert_quant_close(got, ref, frac=0.10)


def test_rawimg_ro2_plan(monkeypatch):
    """Force the ro=2 band geometry (different window-block alignment and
    bottom-halo coverage of the band-0 carry init)."""
    got, ref = rawimg_pair(img=128, seed=5, budget=2_900_000,
                           monkeypatch=monkeypatch)
    assert_quant_close(got, ref, frac=0.10)


def test_full_model_region_rawimg():
    """forward_feature_maps with region_rawimg == plain int8 mirror on a
    small end-to-end model."""
    cfg, params, batch_stats = make_model()
    rng = np.random.RandomState(19)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    scales = Q.calibrate(params, batch_stats, cfg, x)
    ref = Q.forward_feature_maps(params, batch_stats, cfg, x,
                                 act_scales=scales)
    got = Q.forward_feature_maps(params, batch_stats, cfg, x,
                                 act_scales=scales, region_full=True,
                                 region_rawimg=True, region_fast=True,
                                 fused_interpret=True)
    for a, b in zip(got, ref):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        d = np.abs(a - b)
        assert d.max() <= 0.15 * b.std() + 1e-6, (d.max(), b.std())


def test_region_pipe2_bit_identical():
    """The DEEP software pipeline (every stage's MXU acc issued one row
    ahead of its VPU fin, s32 accumulator carries, one-band out shift)
    only reorders work: per-element arithmetic is unchanged, so outputs
    must be bit-identical to the unpiped kernel — including across the
    shifted out-grid's band boundaries and the pipeline-fill prologue."""
    cfg, params, batch_stats = make_model(128)
    rng = np.random.RandomState(29)
    x = jnp.asarray(rng.randn(2, 128, 128, 3).astype(np.float32))
    scales = Q.calibrate(params, batch_stats, cfg, x)
    ref = Q._s2d_region(
        Q._Ctx(cfg, act_scales=scales, region_full=True, region_fast=True,
               fused_interpret=True), params, batch_stats, x)
    got = Q._s2d_region(
        Q._Ctx(cfg, act_scales=scales, region_full=True, region_fast=True,
               region_pipe2=True, fused_interpret=True),
        params, batch_stats, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_region_pipe2_batch_tiles_reinit():
    """b=16 -> two batch tiles: the pipe2 fill prologue must reset the
    q2/q3/q4 AND accumulator carries at the second tile."""
    cfg, params, batch_stats = make_model(64)
    rng = np.random.RandomState(31)
    x = jnp.asarray(rng.randn(16, 64, 64, 3).astype(np.float32))
    scales = Q.calibrate(params, batch_stats, cfg, x)
    ref = Q._s2d_region(
        Q._Ctx(cfg, act_scales=scales, region_full=True, region_fast=True,
               fused_interpret=True), params, batch_stats, x)
    got = Q._s2d_region(
        Q._Ctx(cfg, act_scales=scales, region_full=True, region_fast=True,
               region_pipe2=True, fused_interpret=True),
        params, batch_stats, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_region_pipe_bit_identical():
    """The software-pipeline probe only REORDERS work (row r+1's stem2
    matmuls issued before row r's epilogues); per-row arithmetic is
    unchanged, so outputs must be bit-identical to the unpiped kernel."""
    cfg, params, batch_stats = make_model(128)
    rng = np.random.RandomState(23)
    x = jnp.asarray(rng.randn(2, 128, 128, 3).astype(np.float32))
    scales = Q.calibrate(params, batch_stats, cfg, x)
    ref = Q._s2d_region(
        Q._Ctx(cfg, act_scales=scales, region_full=True, region_fast=True,
               fused_interpret=True), params, batch_stats, x)
    got = Q._s2d_region(
        Q._Ctx(cfg, act_scales=scales, region_full=True, region_fast=True,
               region_pipe=True, fused_interpret=True),
        params, batch_stats, x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
