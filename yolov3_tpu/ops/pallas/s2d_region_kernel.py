"""Pallas TPU kernel: the WHOLE S2D region after stem1 (stem2 -> pw ->
FB0 3x3 -> residual -> exit) as ONE VMEM-resident band pipeline with
cross-band scratch carries.

Extends `s2d_tail_kernel.py` one stage upstream, per the round-4 profile
diff (DESIGN.md round-4 ledger): stem2 runs at 1.91 ms in XLA against a
~0.82 ms traffic + 0.35 ms MXU floor, and its 268 MB/step s8 output is
written to HBM only to be re-read (twice — conv + residual) by the tail.
Folding it in, the kernel consumes stem1's pre-quantized s8 output
directly and the stem2 boundary never exists.

Stages (per output row r of the 128-dom, width W x bt x C):

    x   = s8 stem1 out [N, 2H, 2W, c1]   (scale s1, c1 = 4*Ci)
    q2  = quant(epilogue(sum_9 x[2r+u, 2c+v] @ W2[u,v]), s2)   stem2
          (lifted stride-2 "stay" conv: 3-row/3-col window at stride 2,
           padding (0,1) — models/yolo.py::_s2d_kernel_stride2_stay)
    q3  = quant(epilogue(q2 @ Wpw), s3)                         pw
    z   = epilogue(sum_9taps q3 @ Wfb0[u,v])                    FB0 3x3
    y   = bf16(z) + bf16(q2 * s2)                               residual
    q4  = quant(y, s4)
    out = quant(epilogue(sum_4taps q4 @ Wex), s5)               exit

Unlike the tail kernel (which recomputes its lead stage on 3 halo rows
per band), every q2/q3/q4 row here is computed EXACTLY ONCE: the rolling
pipeline state (1 q2 row, 2 q3 rows, 1 q4 row) is carried between bands
in VMEM scratch — TPU grid iteration is sequential with the last grid
dim innermost, so band jh+1 reads what band jh wrote, and the `jh == 0`
prologue (re)initializes the carry at each new batch tile. Input rows
arrive as two block-aligned `ro`-row views (indices 2*jh+8/ro and +1
of an ro-row blocking — band jh needs 256-dom rows [2*r0+4, 2*r0+2*ro+4],
whose start is ro-block aligned for ro in {2,4}) plus ONE overlap halo
row; the prologue's rows 0..4 ride a constant-index block that Pallas
fetches only when its index changes (= once per batch tile). Column taps
for stem2 come from an even/odd reshape view of the 2W-wide row (tap v=2
is the even view shifted one block left) — no strided slicing.

Layout contract and epilogue semantics identical to the tail kernel
(barrier-pinned [H,W,B,C] bitcast views; `models/quantized.py::_epilogue`
with dq commuted through LeakyReLU; bit-comparable to the XLA mirror).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from yolov3_tpu.ops.pallas.s2d_tail_kernel import _MM, _epilogue, _quant

_VMEM_BUDGET = 13 * 1024 * 1024


def _estimate(ro: int, w: int, bt: int, c1: int, c: int, cm: int,
              co: int, rawin: bool = False, ci2: int = 0,
              pipe2: bool = False) -> int:
    """Peak VMEM bytes for one band (ro output rows). `ci2 > 0` = rawimg
    mode (input is the S2D(2) image, ci2 channels, bf16)."""
    row = w * bt
    if ci2:
        irow = 2 * w * bt * ci2 * 2   # one 256-dom S2D-image row (bf16)
        inp = 2 * (2 * ro + 3) * irow  # Itop + Ia + Ib + Ibot (dblbuf)
        xs = 2 * w * bt * c1          # computed-x carry row (s8)
        stem1 = (2 * w * bt * 9 * ci2 * 2   # packed [2m, 9*ci2] operand
                 + 2 * w * bt * c1 * 4      # f32 acc chain
                 + 9 * ci2 * c1 * 2)        # lifted stem1 weight (bf16)
    else:
        ib = 2 if rawin else 1        # bf16 input rows in rawin mode
        irow = 2 * w * bt * c1 * ib   # one 256-dom input row
        inp = (2 * 2 * ro * irow      # xA + xB blocks (dblbuf)
               + 2 * irow             # overlap halo row (dblbuf)
               # rawin replaces the dedicated 5-row prologue block with
               # an extra carry-init band riding the regular window refs
               + (0 if rawin else 2 * (6 if pipe2 else 5) * irow))
        xs = 0
        stem1 = 0
    # pipe2: 2 extra carried q2 rows (s8) + the three cross-iteration s32
    # accumulator carries (stem2 [row,c], pw [row,cm], fb0 [row,c])
    p2 = (2 * row * c + 4 * row * c + 4 * row * cm + 4 * row * c
          if pipe2 else 0)
    return (inp + xs + stem1 + p2
            + 2 * ro * row * co       # out (dblbuf)
            + row * c + 2 * row * cm + row * c   # scratch carries
            + (ro + 2) * row * cm     # band-live q3 rows
            + 3 * row * c * 4         # per-row s32/f32 chains
            + row * cm * 4
            + 9 * c1 * c + cm * c + 9 * cm * c + 4 * c * co + 22 * c * 4)


def _plan(h: int, w: int, b: int, c1: int, c: int, cm: int, co: int,
          rawin: bool = False, ci2: int = 0, pipe2: bool = False):
    bt = 8 if b % 8 == 0 else b
    # the x-window start 2*r0+4 must be ro-block aligned -> ro in {4, 2};
    # the prologue needs 5 input rows -> 2h >= 5. pipe2's 2-row pipeline
    # delay equals ro only at ro=2 (the out-block shift is one band).
    for ro in ((2,) if pipe2 else (4, 2)):
        if h % ro == 0 and h > ro and _estimate(
                ro, w, bt, c1, c, cm, co, rawin, ci2, pipe2) <= _VMEM_BUDGET:
            return ro, bt
    return 0, 0


def vmem_fits(h: int, w: int, b: int, c1: int, c: int, cm: int,
              co: int, rawin: bool = False, ci2: int = 0) -> bool:
    if h < 4 or w < 2:
        return False
    ro, bt = _plan(h, w, b, c1, c, cm, co, rawin, ci2)
    return ro > 0


def _kernel(*refs, ro: int, h: int, w: int, bt: int, c1: int, c: int,
            cm: int, co: int, alpha: float, cast_bf16: bool, fast: bool,
            affine2: bool, rawin: bool, ci2: int = 0, pipe: bool = False,
            pipe2: bool = False):
    xs = None
    a2s = a3s = a4s = None
    if ci2:
        # rawimg: input is the S2D(2) image [h2, n, ci2, w2] (w2 on
        # lanes — a ci2(=12)-minor layout would lane-pad every VMEM row
        # 128/ci2-fold); stem1 itself runs in-kernel
        xpro_ref = xa_ref = xb_ref = xh_ref = None
        (it_ref, ia_ref, ib_ref, ibo_ref, ws1_ref, w2_ref, wpw_ref,
         wfb_ref, wex_ref, epi_ref, out_ref, q2s, q3s, q4s, xs) = refs
    elif rawin:
        xpro_ref = None
        (xa_ref, xb_ref, xh_ref, w2_ref, wpw_ref, wfb_ref, wex_ref,
         epi_ref, out_ref, q2s, q3s, q4s) = refs
    elif pipe2:
        # deep software pipeline: 3 carried q2 rows + per-stage s32
        # accumulator carries (stem2 / pw / fb0)
        (xpro_ref, xa_ref, xb_ref, xh_ref, w2_ref, wpw_ref, wfb_ref,
         wex_ref, epi_ref, out_ref, q2s, q3s, q4s, a2s, a3s, a4s) = refs
    else:
        (xpro_ref, xa_ref, xb_ref, xh_ref, w2_ref, wpw_ref, wfb_ref,
         wex_ref, epi_ref, out_ref, q2s, q3s, q4s) = refs
    jh = pl.program_id(1)
    # rawin/rawimg/pipe2: band 0 is a pure carry-init pass; out rows for
    # band jh start at (jh-1)*ro
    r0 = (jh - 1) * ro if (rawin or ci2 or pipe2) else jh * ro
    m = w * bt
    h2 = 2 * h

    def stage_q(acc, b, mul, add, inv):
        """conv epilogue + requantize. `fast`: the packing pre-folds the
        requant 1/s into mul/add, LeakyReLU becomes max(y, alpha*y)
        (EXACT for 0<alpha<1), and the mirror's bf16 roundtrip is dropped
        — ~1/3 fewer VPU ops per element, <=2 s8-code divergence."""
        if fast or affine2:
            y = acc.astype(jnp.float32) + b
            y = jnp.maximum(y, alpha * y)
            return jnp.clip(jnp.round(y * mul + add),
                            -127.0, 127.0).astype(jnp.int8)
        y = _epilogue(acc, b, mul, add, alpha, cast_bf16)
        return _quant(y, inv)

    def stage_q2(acc, m1, c1_, m2, c2_):
        """2-affine fast epilogue: mul*leaky(acc+b)+add collapses to
        max(acc*m1+c1, acc*m2+c2) — two FMAs + a max instead of the
        add/leaky/scale chain. Valid as a MAX only for mul >= 0 channels;
        the packing multiplies negative-mul channels' coefficients by -1
        (making the stage emit -q) and compensates by flipping the
        consuming weights' input channels (round-nearest-even and the
        symmetric clip commute with negation), so the kernel output is
        unchanged up to rounding-boundary flips."""
        af = acc.astype(jnp.float32)
        y = jnp.maximum(af * m1 + c1_, af * m2 + c2_)
        return jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)

    def stem2_acc(rows3, g_out):
        """stem2's raw s32 accumulation for q2 row `g_out` (the MXU half
        of stem2_row, split out so the band body can ISSUE row r+1's tap
        matmuls before row r's VPU epilogue chain — a software-pipeline
        probe against Mosaic's per-row MXU/VPU serialization)."""
        acc = None
        for u, row in enumerate(rows3):
            gg = 2 * g_out + u
            rowm = jnp.where(gg <= h2 - 1, row, jnp.zeros_like(row))
            ev = rowm.reshape(w, 2, bt, c1)
            t0 = ev[:, 0]                                  # cols 2j
            t1 = ev[:, 1]                                  # cols 2j+1
            t2 = jnp.concatenate(
                [t0[1:], jnp.zeros((1, bt, c1), jnp.int8)], axis=0)
            for vv, tap in enumerate((t0, t1, t2)):
                part = jax.lax.dot_general(
                    tap.reshape(m, c1), w2_ref[u * 3 + vv], _MM,
                    preferred_element_type=jnp.int32)
                acc = part if acc is None else acc + part
        return acc

    def stem2_fin(acc, g_out):
        """stem2's epilogue+requant (the VPU half of stem2_row)."""
        if affine2:
            q = stage_q2(acc, epi_ref[13, :c], epi_ref[14, :c],
                         epi_ref[15, :c], epi_ref[16, :c]).reshape(w, bt, c)
        else:
            q = stage_q(acc, epi_ref[13, :c], epi_ref[14, :c],
                        epi_ref[15, :c], epi_ref[16, :c]).reshape(w, bt, c)
        return jnp.where(g_out <= h - 1, q, jnp.zeros_like(q))

    def stem2_row(rows3, g_out):
        """q2 row `g_out` from its three 256-dom input rows (already
        masked-fetch order: row u covers global 2*g_out+u)."""
        return stem2_fin(stem2_acc(rows3, g_out), g_out)

    def pw_acc(q2k):
        return jax.lax.dot_general(q2k.reshape(m, c), wpw_ref[...], _MM,
                                   preferred_element_type=jnp.int32)

    def pw_fin(acc, g_out):
        if affine2:
            q = stage_q2(acc, epi_ref[0, :cm], epi_ref[1, :cm],
                         epi_ref[2, :cm],
                         epi_ref[3, :cm]).reshape(w, bt, cm)
        else:
            q = stage_q(acc, epi_ref[0, :cm], epi_ref[1, :cm],
                        epi_ref[2, :cm], epi_ref[3, :cm]).reshape(w, bt, cm)
        # a zero q2 row does NOT give a zero q3 row (bias); re-mask so
        # off-image rows are FB0's zero padding
        return jnp.where(g_out <= h - 1, q, jnp.zeros_like(q))

    def pw_row(q2k, g_out):
        return pw_fin(pw_acc(q2k), g_out)

    def fb0_acc(q3_win):
        zcol = jnp.zeros((1, bt, cm), jnp.int8)
        acc = None
        for u in range(3):
            row = q3_win[u]
            v0 = jnp.concatenate([zcol, row[:-1]], axis=0)
            v2 = jnp.concatenate([row[1:], zcol], axis=0)
            for vv, tap in enumerate((v0, row, v2)):
                part = jax.lax.dot_general(
                    tap.reshape(m, cm), wfb_ref[u * 3 + vv], _MM,
                    preferred_element_type=jnp.int32)
                acc = part if acc is None else acc + part
        return acc

    def fb0_fin(acc, q2_res, g_out):
        if affine2:
            # 2-affine form with the (sign-compensated) residual row at
            # epi[8]: y = max(acc*m1+c1, acc*m2+c2) + q2*r
            af = acc.astype(jnp.float32)
            y = (jnp.maximum(af * epi_ref[4, :c] + epi_ref[5, :c],
                             af * epi_ref[6, :c] + epi_ref[7, :c])
                 + q2_res.reshape(m, c).astype(jnp.float32)
                 * epi_ref[8, :c])
            q = jnp.clip(jnp.round(y), -127.0,
                         127.0).astype(jnp.int8).reshape(w, bt, c)
            return jnp.where(g_out <= h - 1, q, jnp.zeros_like(q))
        if fast:
            # residual folded into the same affine: q4 = clip(round(
            #   affine(acc)*(mul/s4) + add/s4 + q2*(s2/s4) ))
            z = acc.astype(jnp.float32) + epi_ref[4, :c]
            z = jnp.maximum(z, alpha * z)
            y = (z * epi_ref[5, :c] + epi_ref[6, :c]
                 + q2_res.reshape(m, c).astype(jnp.float32)
                 * epi_ref[7, :c])
            q = jnp.clip(jnp.round(y), -127.0,
                         127.0).astype(jnp.int8).reshape(w, bt, c)
            return jnp.where(g_out <= h - 1, q, jnp.zeros_like(q))
        z = _epilogue(acc, epi_ref[4, :c], epi_ref[5, :c], epi_ref[6, :c],
                      alpha, cast_bf16)
        res = q2_res.reshape(m, c).astype(jnp.float32) * epi_ref[7, :c]
        if cast_bf16:
            res = res.astype(jnp.bfloat16).astype(jnp.float32)
        y = res + z
        if cast_bf16:
            y = y.astype(jnp.bfloat16).astype(jnp.float32)
        q = _quant(y, epi_ref[8, :c]).reshape(w, bt, c)
        return jnp.where(g_out <= h - 1, q, jnp.zeros_like(q))

    def fb0_row(q3_win, q2_res, g_out):
        return fb0_fin(fb0_acc(q3_win), q2_res, g_out)

    def exit_acc_half(tap_row, u):
        """Exit-conv taps 2u (unshifted) + 2u+1 (column-shifted) on ONE
        q4 row — split so the q4_a (carry) half can issue before the
        current row's fb0 epilogue in the pipe2 schedule."""
        acc = None
        for vv in range(2):
            tap = tap_row
            if vv == 1:
                tap = jnp.concatenate(
                    [tap[1:], jnp.zeros((1, bt, c), jnp.int8)], axis=0)
            part = jax.lax.dot_general(tap.reshape(m, c),
                                       wex_ref[2 * u + vv], _MM,
                                       preferred_element_type=jnp.int32)
            acc = part if acc is None else acc + part
        return acc

    def exit_fin(j, acc):
        out_ref[j] = stage_q(acc, epi_ref[9, :co], epi_ref[10, :co],
                             epi_ref[11, :co],
                             epi_ref[12, :co]).reshape(w, bt, co)

    def exit_row(j, q4a, q4b):
        exit_fin(j, exit_acc_half(q4a, 0) + exit_acc_half(q4b, 1))

    def x_row(off):
        """256-dom input row at window offset `off` (global 2*r0+4+off;
        rawin band 0: offset == global row)."""
        if off < ro:
            row = xa_ref[off]
        elif off < 2 * ro:
            row = xb_ref[off - ro]
        else:
            row = xh_ref[0]
        if rawin:
            # quantize stem1's bf16 row in-VMEM: the exact
            # models/quantized.py::_quantize_act op sequence (f32 multiply
            # by the reciprocal, round, clip) so the s8 codes are
            # bit-identical to the XLA mirror's block_input quantize
            row = jnp.clip(jnp.round(row.astype(jnp.float32)
                                     * epi_ref[17, 0]),
                           -127.0, 127.0).astype(jnp.int8)
        return row

    def stem1_x_row(r3, t):
        """Stem1 output row t (s8, [2w, bt, c1]) computed from its three
        S2D-image rows t-1, t, t+1 (each [bt, ci2, w2], already masked).

        The 9 lifted taps (3 image rows x 3 column shifts; the column
        shifts are STATIC lane slices since w2 rides the lane dim) stack
        on the contracting dim: per batch slice, ONE [9*ci2, w2]^T @
        [9*ci2, c1] MXU pass — the natural lhsT form, no operand
        transpose. Epilogue: bias -> LeakyReLU -> BN affine (stem1 stays
        unquantized bf16, mirroring the serving quant_skip), then the
        in-VMEM quantize to ConvBlock_1's scale (epi rows 17-20)."""
        zl = jnp.zeros((bt, ci2, 1), r3[0].dtype)
        variants = []
        for row in r3:
            v0 = jnp.concatenate([zl, row[..., :-1]], axis=-1)  # col j-1
            v2 = jnp.concatenate([row[..., 1:], zl], axis=-1)   # col j+1
            variants.append((v0, row, v2))
        outs = []
        for bi in range(bt):
            lhs = jnp.concatenate(
                [v[bi] for vs in variants for v in vs], axis=0)
            acc = jax.lax.dot_general(
                lhs, ws1_ref[...], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # [w2, c1]
            if cast_bf16:
                # the mirror's stem1 conv emits BF16 (f32 accumulation,
                # bf16 result — no preferred_element_type); round the
                # accumulator identically or downstream codes drift
                acc = acc.astype(jnp.bfloat16).astype(jnp.float32)
            y = acc + epi_ref[17, :c1]
            if fast:
                y = jnp.maximum(y, alpha * y)
                q = jnp.clip(
                    jnp.round(y * epi_ref[18, :c1] + epi_ref[19, :c1]),
                    -127.0, 127.0).astype(jnp.int8)
            else:
                y = jnp.where(y >= 0.0, y, alpha * y)
                y = y * epi_ref[18, :c1] + epi_ref[19, :c1]
                if cast_bf16:
                    y = y.astype(jnp.bfloat16).astype(jnp.float32)
                q = _quant(y, epi_ref[20, :c1])
            outs.append(q)
        q = jnp.stack(outs, axis=1)                             # [2w, bt, c1]
        return jnp.where(t <= h2 - 1, q, jnp.zeros_like(q))

    def i_row(off):
        """S2D-image row at window offset `off` in [0, 2*ro+2] (global
        row 2*r0+3+off), masked to zeros off-image."""
        if off == 0:
            row = it_ref[0]
        elif off <= ro:
            row = ia_ref[off - 1]
        elif off <= 2 * ro:
            row = ib_ref[off - 1 - ro]
        else:
            row = ibo_ref[off - 1 - 2 * ro]
        g = 2 * r0 + 3 + off
        return jnp.where(g <= h2 - 1, row, jnp.zeros_like(row))

    def _prologue():
        # carry-init for out row 0: q2 row 1, q3 rows 0..1, q4 row 0.
        # rawin/rawimg: rows 0..4 arrive through the regular window refs
        # (band 0 is carry-init only; its out block is overwritten by
        # band 1)
        if ci2:
            def pro_i(t):
                # I rows 0..5 through the jh==0-clamped window blocks
                # (Ia = block 0, Ib = block 1, Ibot = rows 4..5); row -1
                # is exact zeros (its only weight slots are zero-padded)
                if t < 0:
                    return jnp.zeros((bt, ci2, 2 * w), ia_ref.dtype)
                if t < ro:
                    return ia_ref[t]
                if t < 2 * ro:
                    return ib_ref[t - ro]
                return ibo_ref[t - 2 * ro]

            rows5 = [stem1_x_row([pro_i(t - 1), pro_i(t), pro_i(t + 1)], t)
                     for t in range(5)]
            xs[0] = rows5[4]
        else:
            pro = x_row if rawin else (lambda u: xpro_ref[u])
            rows5 = [pro(u) for u in range(5)]
        q2_0 = stem2_row(rows5[0:3], 0)
        q2_1 = stem2_row(rows5[2:5], 1)
        q3_0 = pw_row(q2_0, 0)
        q3_1 = pw_row(q2_1, 1)
        zrow = jnp.zeros((w, bt, cm), jnp.int8)   # q3[-1]: FB0's top pad
        q2s[0] = q2_1
        q3s[0] = q3_0
        q3s[1] = q3_1
        q4s[0] = fb0_row([zrow, q3_0, q3_1], q2_0, 0)

    def _body():
        # band body: out rows r = r0 + j; each step computes q2/q3 row
        # r+2, q4 row r+1, and the exit conv for row r
        q2_prev = q2s[0]            # q2 row r0+1
        q3_a, q3_b = q3s[0], q3s[1]  # q3 rows r0, r0+1
        q4_a = q4s[0]               # q4 row r0
        x_hi = None                 # offset 2j+2 == next j's offset 2j
        x_lo = xs[0] if ci2 else None  # x row 2*r0+4 (cross-band carry)
        if pipe and not ci2:
            # software-pipeline probe: row r+1's stem2 tap matmuls are
            # ISSUED before row r's VPU epilogue chain, giving Mosaic's
            # scheduler explicit MXU work to overlap with the epilogues
            acc_next = stem2_acc([x_row(0), x_row(1), x_row(2)], r0 + 2)
            for j in range(ro):
                g = r0 + j + 2
                acc_cur = acc_next
                if j + 1 < ro:
                    acc_next = stem2_acc(
                        [x_row(2 * j + 2), x_row(2 * j + 3),
                         x_row(2 * j + 4)], g + 1)
                q2_new = stem2_fin(acc_cur, g)
                q3_new = pw_row(q2_new, g)
                q4_new = fb0_row([q3_a, q3_b, q3_new], q2_prev, r0 + j + 1)
                exit_row(j, q4_a, q4_new)
                q2_prev, q3_a, q3_b, q4_a = q2_new, q3_b, q3_new, q4_new
            q2s[0] = q2_prev
            q3s[0] = q3_a
            q3s[1] = q3_b
            q4s[0] = q4_a
            return
        for j in range(ro):
            g = r0 + j + 2
            if ci2:
                # x rows 2*r0+4 + 2j+1 / +2j+2, each computed EXACTLY
                # once (the band-boundary row rides the xs carry)
                x_mid = stem1_x_row(
                    [i_row(2 * j + 1), i_row(2 * j + 2), i_row(2 * j + 3)],
                    2 * r0 + 5 + 2 * j)
                x_hi = stem1_x_row(
                    [i_row(2 * j + 2), i_row(2 * j + 3), i_row(2 * j + 4)],
                    2 * r0 + 6 + 2 * j)
            else:
                x_lo = x_row(2 * j) if x_hi is None else x_hi
                x_mid = x_row(2 * j + 1)
                x_hi = x_row(2 * j + 2)
            q2_new = stem2_row([x_lo, x_mid, x_hi], g)
            q3_new = pw_row(q2_new, g)
            q4_new = fb0_row([q3_a, q3_b, q3_new], q2_prev, r0 + j + 1)
            exit_row(j, q4_a, q4_new)
            q2_prev, q3_a, q3_b, q4_a = q2_new, q3_b, q3_new, q4_new
            x_lo = x_hi
        if ci2:
            xs[0] = x_lo
        q2s[0] = q2_prev
        q3s[0] = q3_a
        q3s[1] = q3_b
        q4s[0] = q4_a

    def _pro_x(t):
        """pipe2 prologue: global x row t in [0, 10] — rows 0..5 from the
        6-row constant block, rows 6..10 through the band-0 window refs
        (whose pipe2 index maps put rows 6..10 exactly there at jh=0)."""
        if t < 6:
            return xpro_ref[t]
        return x_row(t - 6)

    def _prologue2():
        # pipeline fill for band 1 (out rows 0..ro-1): q2 rows 1..3, q3
        # rows 1..2, q4 row 0, plus the three stage accumulators (stem2
        # acc row 4, pw acc row 3, fb0 acc for q4 row 1). Needs x rows
        # 0..10; rows past h2-1 are masked inside stem2_acc/the fins.
        rows = [_pro_x(t) for t in range(11)]
        q2r = [stem2_row(rows[2 * t:2 * t + 3], t) for t in range(4)]
        a2s[0] = stem2_acc(rows[8:11], 4).reshape(w, bt, c)
        q3r = [pw_row(q2r[t], t) for t in range(3)]
        a3s[0] = pw_acc(q2r[3]).reshape(w, bt, cm)
        zrow = jnp.zeros((w, bt, cm), jnp.int8)
        q4s[0] = fb0_row([zrow, q3r[0], q3r[1]], q2r[0], 0)
        a4s[0] = fb0_acc([q3r[0], q3r[1], q3r[2]]).reshape(w, bt, c)
        q2s[0] = q2r[1]
        q2s[1] = q2r[2]
        q2s[2] = q2r[3]
        q3s[0] = q3r[1]
        q3s[1] = q3r[2]

    def _body2():
        # 2-row-deep software pipeline: every stage's fin (VPU epilogue)
        # consumes an accumulator MXU-issued one row earlier, and each
        # fin is immediately followed by the one MXU acc that depends on
        # it — so Mosaic always has independent matmul work in flight
        # while a VPU chain runs. Iteration j (out row rE = r0+j) fins
        # q2(rE+4) / q3(rE+3) / q4(rE+1) / out(rE) and issues the accs
        # for q2(rE+5) / q3(rE+4) / q4(rE+2) / half of out(rE+1).
        q2_a, q2_b, q2_c = q2s[0], q2s[1], q2s[2]   # rows r0+1..r0+3
        q3_a, q3_b = q3s[0], q3s[1]                 # rows r0+1, r0+2
        q4_a = q4s[0]                               # row r0
        acc2 = a2s[0].reshape(m, c)                 # stem2 acc row r0+4
        acc3 = a3s[0].reshape(m, cm)                # pw acc row r0+3
        acc4 = a4s[0].reshape(m, c)                 # fb0 acc, q4 row r0+1
        for j in range(ro):
            rE = r0 + j
            # independent MXU first: next stem2 acc + the carry half of
            # this row's exit conv overlap the whole VPU chain below
            acc2_new = stem2_acc(
                [x_row(2 * j), x_row(2 * j + 1), x_row(2 * j + 2)], rE + 5)
            accE = exit_acc_half(q4_a, 0)
            q2_new = stem2_fin(acc2, rE + 4)
            acc3_new = pw_acc(q2_new)
            q3_new = pw_fin(acc3, rE + 3)
            acc4_new = fb0_acc([q3_a, q3_b, q3_new])
            q4_new = fb0_fin(acc4, q2_a, rE + 1)
            accE = accE + exit_acc_half(q4_new, 1)
            exit_fin(j, accE)
            q2_a, q2_b, q2_c = q2_b, q2_c, q2_new
            q3_a, q3_b = q3_b, q3_new
            q4_a = q4_new
            acc2, acc3, acc4 = acc2_new, acc3_new, acc4_new
        q2s[0] = q2_a
        q2s[1] = q2_b
        q2s[2] = q2_c
        q3s[0] = q3_a
        q3s[1] = q3_b
        q4s[0] = q4_a
        a2s[0] = acc2.reshape(w, bt, c)
        a3s[0] = acc3.reshape(w, bt, cm)
        a4s[0] = acc4.reshape(w, bt, c)

    if pipe2:
        pl.when(jh == 0)(_prologue2)
        pl.when(jh != 0)(_body2)
    elif rawin or ci2:
        pl.when(jh == 0)(_prologue)
        pl.when(jh != 0)(_body)
    else:
        pl.when(jh == 0)(_prologue)
        _body()


@functools.partial(jax.jit,
                   static_argnames=("alpha", "cast_bf16", "fast",
                                    "affine2", "rawin", "rawimg", "pipe",
                                    "pipe2", "interpret"))
def s2d_region_block_q(xq: jnp.ndarray, w_s2: jnp.ndarray,
                       w_pw: jnp.ndarray, w_fb0: jnp.ndarray,
                       w_exit: jnp.ndarray, epi: jnp.ndarray,
                       w_s1: jnp.ndarray = None, *,
                       alpha: float = 0.1, cast_bf16: bool = True,
                       fast: bool = False, affine2: bool = False,
                       rawin: bool = False, rawimg: bool = False,
                       pipe: bool = False, pipe2: bool = False,
                       interpret: bool = False) -> jnp.ndarray:
    """s8 [N,2H,2W,c1] (stem1 out) -> s8 [N,H,W,Co] (FeatureBlock_1 in).

    w_s2 s8 [9, c1, 4Ci] ((U,V) major lifted stride-2 "stay" kernel);
    w_pw s8 [4Ci, 4Cm]; w_fb0 s8 [9, 4Cm, 4Ci]; w_exit s8 [4, 4Ci, Co].
    epi f32 [17, max_c]:
      0-3   pw:    b/dq, mul*dq, add, 1/s3
      4-8   fb0:   b/dq, mul*dq, add, s2 (residual dequant), 1/s4
      9-12  exit:  b/dq, mul*dq, add, 1/s5
      13-16 stem2: b/dq, mul*dq, add, 1/s2
    (per-stage rows zero-padded to the widest channel count).

    `fast`: the caller pre-folds each stage's requant 1/s into its
    mul/add rows (for fb0 also fold 1/s4 into the residual's s2 row);
    rows 3/8/12/16 are then ignored, LeakyReLU runs as max(y, alpha*y)
    (exact), and the mirror's intermediate bf16 casts are dropped —
    ~1/3 fewer VPU ops per element at <=2 s8-code divergence from the
    exact mode.

    `affine2`: the stem2/pw/fb0 epilogues collapse further to
    max(acc*m1+c1, acc*m2+c2) (two FMAs + max); the caller packs
      0-3   pw:    m1, c1, m2, c2          (m1=M/s, c1=m1*B+A/s, m2=alpha*m1,
      4-8   fb0:   m1, c1, m2, c2, r       c2=m2*B+A/s, each row *sign(M);
      13-16 stem2: m1, c1, m2, c2           negative-M channels compensated
                                            by flipping consumer-weight
                                            input channels + the r row)
    and the exit stage (whose consumer is outside the kernel) keeps the
    `fast` rows 9-11. Same <=2-code divergence class as `fast`.

    `rawin`: xq is stem1's RAW bf16/f32 output (NOT pre-quantized); the
    kernel quantizes each fetched row in-VMEM with epi row 17 (= 1/s1,
    `_quantize_act`'s exact op sequence, so the s8 codes are
    bit-identical to the XLA mirror's block_input quantize). The s8
    stem1 boundary then never exists in HBM: the separate quantize
    fusion's 1.07 GB read + 537 MB write at b64/512px disappear against
    the kernel's doubled (bf16) input-row bytes. (MEASURED NEGATIVE
    round 5: 28.77 vs 27.63 ms b64 — the doubled input-row reads plus
    the in-VMEM quantize on the kernel's serialized VPU path cost more
    than the deleted XLA quantize fusion. Kept as the tested record.)

    `rawimg`: xq is the Z-SCORED IMAGE itself [N, 4H, 4W, ci] — stem1
    runs IN-KERNEL (w_s1 = `_s2d_kernel_stem1_s2d2` lift, [9*4ci, c1],
    the model compute dtype; epi rows 17-20 = stem1 b / mul / add /
    1/s1). The wrapper space-to-depths the image to [2H, N, 4ci, 2W]
    (w2 on lanes — channel-minor would lane-pad every VMEM row
    128/12-fold) and the kernel computes each stem1 output row once,
    carrying the band-boundary row in scratch. stem1's ENTIRE HBM
    boundary (1.07 GB bf16 out + 537 MB s8 in at b64/512px) and the
    XLA stem1 conv + quantize fusions disappear; the kernel's input
    traffic drops to the ~100 MB image, which also shrinks the window
    blocks enough to restore ro=4 (the s8-input plan runs ro=2 at the
    512px shape).
    """
    if rawimg:
        n, hr, wr, ci = xq.shape
        h2, w2 = hr // 2, wr // 2
        ci2 = 4 * ci
        c1 = w_s2.shape[1]
    else:
        ci2 = 0
        n, h2, w2, c1 = xq.shape
    h, w = h2 // 2, w2 // 2
    c = w_s2.shape[-1]
    cm = w_pw.shape[-1]
    co = w_exit.shape[-1]
    if pipe2 and (rawin or rawimg):
        pipe2 = False  # the deep pipeline targets the s8-input path only
    if pipe2:
        ro, bt = _plan(h, w, n, c1, c, cm, co, pipe2=True)
        if ro != 2:
            pipe2 = False  # ro=2 plan doesn't fit: fall back to pipe/plain
    if not pipe2:
        ro, bt = _plan(h, w, n, c1, c, cm, co, rawin, ci2)
    nhb = h // ro
    lead = 4 // ro  # x-window start 2*r0+4 in ro-row block units

    if rawimg:
        # ONE XLA transpose: [N,4H,4W,ci] -> S2D(2) [2H, N, 4ci, 2W]
        xt = jnp.transpose(xq.reshape(n, h2, 2, w2, 2, ci),
                           (1, 0, 2, 4, 5, 3)
                           ).reshape(h2, n, ci2, w2)
    else:
        xt = jnp.transpose(xq, (1, 2, 0, 3))  # bitcast on conv layouts
    nb2 = h2 // ro  # number of ro-row blocks in the 256-dom

    weight_specs = [
        pl.BlockSpec(w_s2.shape, lambda ib, jh: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w_pw.shape, lambda ib, jh: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w_fb0.shape, lambda ib, jh: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(w_exit.shape, lambda ib, jh: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(epi.shape, lambda ib, jh: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if rawimg:
        # band jh >= 1 computes out rows r0 = (jh-1)*ro; its stem1 rows
        # [2*r0+4, 2*r0+2*ro+4] read image rows [2*r0+3, 2*r0+2*ro+5]:
        # one top halo row + two aligned ro-blocks + a 2-row bottom halo
        # block. Band 0 is carry-init (stem1 rows 0..4 from image rows
        # 0..5 through the jh==0-clamped blocks; image row -1 is exact
        # zeros in the lift).
        ishape = (bt, ci2, w2)
        in_specs = [
            pl.BlockSpec((1,) + ishape,
                         lambda ib, jh: (jnp.clip(2 * ro * (jh - 1) + 3,
                                                  0, h2 - 1), ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ro,) + ishape,
                         lambda ib, jh: (jnp.clip(2 * jh - 2 + lead, 0,
                                                  nb2 - 1), ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ro,) + ishape,
                         lambda ib, jh: (jnp.minimum(
                             jnp.maximum(2 * jh - 2 + lead, 0) + 1,
                             nb2 - 1), ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2,) + ishape,
                         lambda ib, jh: (jnp.clip(jh * ro + 2, 0,
                                                  h2 // 2 - 1), ib, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w_s1.shape, lambda ib, jh: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + weight_specs
        grid = (n // bt, nhb + 1)
        # band 0 writes nothing real; its block (index 0) is revisited
        # and fully overwritten by band 1 before the flush
        out_spec = pl.BlockSpec((ro, w, bt, co),
                                lambda ib, jh: (jnp.maximum(jh - 1, 0),
                                                0, ib, 0),
                                memory_space=pltpu.VMEM)
        inputs = (xt, xt, xt, xt, w_s1.astype(xq.dtype))
    elif rawin:
        # band jh >= 1 computes out rows r0 = (jh-1)*ro from window rows
        # [2*r0+4, 2*r0+2*ro+4]; band 0 is carry-init from rows 0..4,
        # riding the same refs (xa = block 0, xb = block 1, halo = row 4)
        in_specs = [
            pl.BlockSpec((ro, w2, bt, c1),
                         lambda ib, jh: (jnp.clip(2 * jh - 2 + lead, 0,
                                                  nb2 - 1), 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ro, w2, bt, c1),
                         lambda ib, jh: (jnp.minimum(
                             jnp.maximum(2 * jh - 2 + lead, 0) + 1,
                             nb2 - 1), 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w2, bt, c1),
                         lambda ib, jh: (jnp.minimum(2 * ro * jh + 4,
                                                     h2 - 1), 0, ib, 0),
                         memory_space=pltpu.VMEM),
        ] + weight_specs
        grid = (n // bt, nhb + 1)
        # band 0 writes nothing real; its block (index 0) is revisited
        # and fully overwritten by band 1 before the flush
        out_spec = pl.BlockSpec((ro, w, bt, co),
                                lambda ib, jh: (jnp.maximum(jh - 1, 0),
                                                0, ib, 0),
                                memory_space=pltpu.VMEM)
        inputs = (xt, xt, xt)
    elif pipe2:
        # band jh >= 1 computes out rows r0 = (jh-1)*ro; its stem2 accs
        # run 5 rows ahead of the out rows, so the band window is x rows
        # [2*r0+10, 2*r0+2*ro+10] = [4jh+6, 4jh+10] (ro=2): two aligned
        # blocks + one overlap halo row. Band 0 (pipeline fill) needs x
        # rows 0..10: rows 0..5 through a dedicated 6-row constant block,
        # rows 6..10 through these same window refs (their jh=0 indices
        # land exactly there).
        in_specs = [
            pl.BlockSpec((6, w2, bt, c1), lambda ib, jh: (0, 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ro, w2, bt, c1),
                         lambda ib, jh: (jnp.minimum(2 * jh + 3,
                                                     nb2 - 1), 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ro, w2, bt, c1),
                         lambda ib, jh: (jnp.minimum(2 * jh + 4,
                                                     nb2 - 1), 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w2, bt, c1),
                         lambda ib, jh: (jnp.minimum(4 * jh + 10,
                                                     h2 - 1), 0, ib, 0),
                         memory_space=pltpu.VMEM),
        ] + weight_specs
        grid = (n // bt, nhb + 1)
        # band 0 writes nothing real; its block (index 0) is revisited
        # and fully overwritten by band 1 before the flush
        out_spec = pl.BlockSpec((ro, w, bt, co),
                                lambda ib, jh: (jnp.maximum(jh - 1, 0),
                                                0, ib, 0),
                                memory_space=pltpu.VMEM)
        inputs = (xt, xt, xt, xt)
    else:
        in_specs = [
            # prologue rows 0..4: constant block index -> fetched only
            # when a new batch tile starts
            pl.BlockSpec((5, w2, bt, c1), lambda ib, jh: (0, 0, ib, 0),
                         memory_space=pltpu.VMEM),
            # band window rows [2*r0+4, 2*r0+2*ro+4): two aligned ro-row
            # blocks + the single overlap row (clamped at the bottom edge;
            # out-of-image rows are masked in-kernel)
            pl.BlockSpec((ro, w2, bt, c1),
                         lambda ib, jh: (jnp.minimum(2 * jh + lead,
                                                     nb2 - 1), 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ro, w2, bt, c1),
                         lambda ib, jh: (jnp.minimum(2 * jh + lead + 1,
                                                     nb2 - 1), 0, ib, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w2, bt, c1),
                         lambda ib, jh: (jnp.minimum(
                             2 * ro * (jh + 1) + 4, h2 - 1), 0, ib, 0),
                         memory_space=pltpu.VMEM),
        ] + weight_specs
        grid = (n // bt, nhb)
        out_spec = pl.BlockSpec((ro, w, bt, co),
                                lambda ib, jh: (jh, 0, ib, 0),
                                memory_space=pltpu.VMEM)
        inputs = (xt, xt, xt, xt)

    scratch = [
        pltpu.VMEM((3 if pipe2 else 1, w, bt, c), jnp.int8),  # q2 carry
        pltpu.VMEM((2, w, bt, cm), jnp.int8),   # q3 carry
        pltpu.VMEM((1, w, bt, c), jnp.int8),    # q4 carry
    ]
    if pipe2:
        scratch += [
            pltpu.VMEM((1, w, bt, c), jnp.int32),    # stem2 acc carry
            pltpu.VMEM((1, w, bt, cm), jnp.int32),   # pw acc carry
            pltpu.VMEM((1, w, bt, c), jnp.int32),    # fb0 acc carry
        ]
    if rawimg:
        scratch.append(pltpu.VMEM((1, 2 * w, bt, c1), jnp.int8))  # x carry
    out = pl.pallas_call(
        functools.partial(_kernel, ro=ro, h=h, w=w, bt=bt, c1=c1, c=c,
                          cm=cm, co=co, alpha=alpha, cast_bf16=cast_bf16,
                          fast=fast, affine2=affine2, rawin=rawin,
                          ci2=ci2, pipe=pipe, pipe2=pipe2),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((h, w, n, co), jnp.int8),
        scratch_shapes=scratch,
        interpret=interpret,
    )(*inputs, w_s2, w_pw, w_fb0, w_exit, epi.astype(jnp.float32))
    return jnp.transpose(out, (2, 0, 1, 3))
