"""Fused whole-sampler kernel: ALL Euler steps of the rectified-flow head in
ONE pallas_call.

The per-step stack kernel (rf_mlp.rf_mlp_stack) already streams the quantized
MLP tables at close to the HBM floor, but each Euler step still pays:
  - a fresh pipeline ramp (block 0's weight DMA is exposed while the XLA glue
    between calls runs), and
  - the XLA glue itself (input_proj, final LN+mod+linear, CFG combine, Euler
    update) as separate fusions with their own latencies.
Measured round 3: 1.01 ms/step vs a 0.46 ms DMA floor (BENCHMARKS "RF int4
unpack sweep") — about half the step is NOT weight streaming.

Here the grid is (steps, blocks, hidden-chunks): the running LATENT lives in
VMEM scratch across the whole sample, the input/final projections (tiny,
zero-padded to 128 latent lanes) stay VMEM-resident, and the step boundary
work (input_proj, final modulate+linear, CFG combine incl. optional channel
renorm, Euler update) runs in-kernel between weight sweeps — so block 0 of
step s+1 prefetches WHILE step s's epilogue computes, and no XLA glue sits on
the critical path. Weight bytes cross HBM exactly once per step, back-to-back.

Reference semantics mirrored exactly (diff_loss_rf_swiglu.py:103-181): Euler
over the precomputed time grid, [cond, uncond(, text_uncond)] block-major CFG
rows, optional channel renorm. Modulations are precomputed for all steps
outside (rf_head.precompute_modulations) — they depend on (t, z) only.

Variants: int4 s8 (integer-MXU dots — the headline T2I tier) and int8 exact
(convert dots — the quality tier). bf16 / NF4 tables keep the XLA loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_TPU = True
except Exception:  # pragma: no cover
    pltpu = None
    PALLAS_TPU = False

from mingunivision_tpu.ops.kernels.intdot import (
    mm4_s8,
    mm8_s8,
    quant_rows_s8,
    quant_rows_s8_pair,
)

LAT = 128  # latent lanes in-kernel (target_channels zero-padded to one lane tile)


def _modulated_ln(x, lnw, lnb, mods, w, ln_eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    ln = (x - mu) * jax.lax.rsqrt(var + ln_eps)
    ln = ln * lnw + lnb
    return ln * (1.0 + mods[:, w : 2 * w]) + mods[:, :w]


def _step_epilogue(
    s, xcur_ref, xlat_ref, o_ref, fmods_ref, wfin_ref, bfin_ref, meta_ref,
    *, ln_eps, compute_dtype, cfg_rows, n_img, renorm_channel, num_steps,
):
    """Final LN+mod+linear -> velocity, CFG combine, Euler update (in-kernel).

    `s` is the step program id captured at kernel TOP level — program_id
    inside a pl.when branch is not substituted by the HLO interpreter."""
    x = xcur_ref[...]
    w = x.shape[-1]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    ln = (x - mu) * jax.lax.rsqrt(var + ln_eps)  # final LN has no affine
    fm = fmods_ref[0]  # (Np, 2w) f32
    xs = (ln * (1.0 + fm[:, w:]) + fm[:, :w]).astype(compute_dtype)
    v = jax.lax.dot_general(
        xs, wfin_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) + bfin_ref[...].reshape(1, -1)  # (Np, LAT) f32
    Np = v.shape[0]
    tcfg = meta_ref[num_steps]
    icfg = meta_ref[num_steps + 1]
    n = n_img
    if cfg_rows == 3:
        v_c, v_u, v_tu = v[0:n], v[n : 2 * n], v[2 * n : 3 * n]
        vg = v_u + icfg * (v_tu - v_u) + tcfg * (v_c - v_tu)
        if renorm_channel:
            scl = jnp.clip(
                jnp.sqrt(jnp.sum(v_c * v_c, axis=-1, keepdims=True))
                / jnp.sqrt(jnp.sum(vg * vg, axis=-1, keepdims=True))
                + 1e-8,
                0.0,
                1.0,
            )
            vg = vg * scl
        parts = [vg, vg, vg]
    elif cfg_rows == 2:
        v_c, v_u = v[0:n], v[n : 2 * n]
        vg = v_u + tcfg * (v_c - v_u)
        if renorm_channel:
            scl = jnp.clip(
                jnp.sqrt(jnp.sum(v_c * v_c, axis=-1, keepdims=True))
                / jnp.sqrt(jnp.sum(vg * vg, axis=-1, keepdims=True))
                + 1e-8,
                0.0,
                1.0,
            )
            vg = vg * scl
        parts = [vg, vg]
    else:
        parts = [v[0 : Np]]
    rows = cfg_rows * n if cfg_rows in (2, 3) else Np
    if rows < Np:
        parts.append(jnp.zeros((Np - rows, v.shape[-1]), jnp.float32))
    v_full = jnp.concatenate(parts, axis=0)
    dt = meta_ref[s]
    xlat_ref[...] += dt * v_full

    @pl.when(s == num_steps - 1)
    def _flush():
        o_ref[...] = xlat_ref[...].astype(o_ref.dtype)


def _sampler_q4_s8_pipelined(
    meta_ref,  # SMEM (S+2,) f32: [dts..., text_cfg, image_cfg]
    x0_ref,
    win_ref,
    binp_ref,
    lnw_ref,
    lnb_ref,
    q1_ref,  # (1, w/2, CH) packed gate cols — clamped to last chunk in down phase
    s1_ref,
    b1_ref,
    q2_ref,  # (1, w/2, CH) packed up cols
    s2_ref,
    b2_ref,
    q3_ref,  # (1, KC, w) packed down ROW CHUNK — streamed across the down phase
    s3_ref,
    b3_ref,
    mods_ref,
    fmods_ref,
    wfin_ref,
    bfin_ref,
    o_ref,
    xlat_ref,  # VMEM f32 (Np, LAT)
    xcur_ref,  # VMEM f32 (Np, w)
    a1_ref,
    a2_ref,
    b1_sref,  # VMEM s8 (Np, H/2) quantized h halves
    b2_sref,
    st_ref,  # VMEM f32 (Np, 128): [sa1, sa2, corr, sb1, sb2, corrh]
    h_ref,  # VMEM (Np, H) compute dtype
    dacc_ref,  # VMEM f32 (Np, w): down-proj accumulator
    *,
    ln_eps: float,
    compute_dtype,
    cfg_rows: int,
    n_img: int,
    renorm_channel: bool,
    num_steps: int,
    hc: int,  # number of gate/up chunk steps
    dc: int,  # number of down-proj chunk steps (grid axis 2 = hc + dc)
):
    """Pipelined variant of `_sampler_q4_s8`: the c axis covers BOTH phases —
    c < hc runs the gate/up column chunks (as before), c >= hc runs the
    down-proj as `dc` ROW chunks whose (1, KC, w) q3 blocks stream through the
    normal Pallas pipeline instead of one monolithic (H/2, w) block. The
    monolithic block is the suspected schedule sin of the original: it must
    fully land before the (single) down step can start, its prefetch competes
    with the next step's w12 chunks, and its double buffer alone holds ~25 MB
    of VMEM. Here every grid step carries a similar-size DMA (q1/q2 indexes
    clamp to the last chunk during the down phase, so they cost nothing
    there), and the down compute overlaps the stream."""
    s = pl.program_id(0)
    l = pl.program_id(1)
    c = pl.program_id(2)
    w = xcur_ref.shape[-1]
    half = w // 2
    KC = q3_ref.shape[-2]

    @pl.when((s == 0) & (l == 0) & (c == 0))
    def _load_noise():
        xlat_ref[...] = x0_ref[...]

    @pl.when((l == 0) & (c == 0))
    def _input_proj():
        xcur_ref[...] = jax.lax.dot_general(
            xlat_ref[...].astype(compute_dtype),
            win_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + binp_ref[...].reshape(1, -1)

    @pl.when(c == 0)
    def _modulate_and_quant():
        xs = _modulated_ln(
            xcur_ref[...],
            lnw_ref[...].reshape(-1)[None, :],
            lnb_ref[...].reshape(-1)[None, :],
            mods_ref[0, 0],
            w,
            ln_eps,
        )
        a1, a2, sa1, sa2, corr = quant_rows_s8_pair(xs[:, :half], xs[:, half:])
        a1_ref[...] = a1
        a2_ref[...] = a2
        st_ref[:, 0:1] = sa1
        st_ref[:, 1:2] = sa2
        st_ref[:, 2:3] = corr

    @pl.when(c < hc)
    def _gate_up():
        CH = q1_ref.shape[-1]
        a1 = a1_ref[...]
        a2 = a2_ref[...]
        sa1 = st_ref[:, 0:1]
        sa2 = st_ref[:, 1:2]
        corr = st_ref[:, 2:3]

        def mm(q_ref):
            qb = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])
            return mm4_s8(qb, a1, a2, sa1, sa2, corr)

        g = mm(q1_ref) * s1_ref[...].reshape(-1)[None, :] + b1_ref[...].reshape(-1)[None, :]
        u = mm(q2_ref) * s2_ref[...].reshape(-1)[None, :] + b2_ref[...].reshape(-1)[None, :]
        h_ref[:, pl.ds(c * CH, CH)] = (jax.nn.silu(g) * u).astype(h_ref.dtype)

    @pl.when(c == hc)
    def _quant_h():
        H = h_ref.shape[-1]
        Hh = H // 2
        hf = h_ref[...].astype(jnp.float32)
        b1q, b2q, sb1, sb2, corrh = quant_rows_s8_pair(hf[:, :Hh], hf[:, Hh:])
        b1_sref[...] = b1q
        b2_sref[...] = b2q
        st_ref[:, 3:4] = sb1
        st_ref[:, 4:5] = sb2
        st_ref[:, 5:6] = corrh
        dacc_ref[...] = jnp.zeros_like(dacc_ref)

    @pl.when(c >= hc)
    def _down_chunk():
        cd = c - hc
        qb = q3_ref[...].reshape(KC, w)
        bx = jax.lax.bitcast_convert_type(qb ^ jnp.uint8(0x80), jnp.int8)
        m = bx & jnp.int8(0xF)
        b1k = b1_sref[:, pl.ds(cd * KC, KC)]
        b2k = b2_sref[:, pl.ds(cd * KC, KC)]
        d1 = jax.lax.dot_general(b1k, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        d2 = jax.lax.dot_general(b2k, bx, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
        dacc_ref[...] += d1.astype(jnp.float32) * st_ref[:, 3:4] + d2.astype(jnp.float32) * (
            st_ref[:, 4:5] * (1.0 / 16.0)
        )

        @pl.when(cd == dc - 1)
        def _residual():
            po = dacc_ref[...] - st_ref[:, 5:6]
            po = po * s3_ref[...].reshape(-1)[None, :] + b3_ref[...].reshape(-1)[None, :]
            xcur_ref[...] += mods_ref[0, 0][:, 2 * w :] * po

            @pl.when(l == pl.num_programs(1) - 1)
            def _epilogue():
                _step_epilogue(
                    s, xcur_ref, xlat_ref, o_ref, fmods_ref, wfin_ref, bfin_ref, meta_ref,
                    ln_eps=ln_eps, compute_dtype=compute_dtype, cfg_rows=cfg_rows,
                    n_img=n_img, renorm_channel=renorm_channel, num_steps=num_steps,
                )


def _sampler_q4_s8(
    meta_ref,  # SMEM (S+2,) f32: [dts..., text_cfg, image_cfg]
    x0_ref,  # (Np, LAT) f32 noise (latent channels zero-padded)
    win_ref,  # (LAT, w) compute-dtype input_proj (padded rows are zero)
    binp_ref,  # (1, w) f32
    lnw_ref,  # (1, 1, w)
    lnb_ref,
    q1_ref,  # (1, w/2, CH) u8 packed gate cols
    s1_ref,
    b1_ref,
    q2_ref,  # (1, w/2, CH) packed up cols
    s2_ref,
    b2_ref,
    q3_ref,  # (1, H/2, w) packed down rows — full per block
    s3_ref,
    b3_ref,
    mods_ref,  # (1, 1, Np, 3w) f32: block (l, s)
    fmods_ref,  # (1, Np, 2w) f32: block (s)
    wfin_ref,  # (w, LAT) compute-dtype final linear (padded cols zero)
    bfin_ref,  # (1, LAT) f32
    o_ref,  # (Np, LAT)
    xlat_ref,  # VMEM f32 (Np, LAT): the Euler latent, lives across ALL steps
    xcur_ref,  # VMEM f32 (Np, w): running activation within one step
    a1_ref,  # VMEM s8 (Np, w/2)
    a2_ref,  # VMEM s8 (Np, w/2)
    b1_sref,  # VMEM s8 (Np, H/2)
    b2_sref,  # VMEM s8 (Np, H/2)
    st_ref,  # VMEM f32 (Np, 128)
    h_ref,  # VMEM (Np, H) compute dtype
    *,
    ln_eps: float,
    compute_dtype,
    cfg_rows: int,
    n_img: int,
    renorm_channel: bool,
    num_steps: int,
):
    s = pl.program_id(0)
    l = pl.program_id(1)
    c = pl.program_id(2)
    w = xcur_ref.shape[-1]
    CH = q1_ref.shape[-1]
    half = w // 2

    @pl.when((s == 0) & (l == 0) & (c == 0))
    def _load_noise():
        xlat_ref[...] = x0_ref[...]

    @pl.when((l == 0) & (c == 0))
    def _input_proj():
        xcur_ref[...] = jax.lax.dot_general(
            xlat_ref[...].astype(compute_dtype),
            win_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + binp_ref[...].reshape(1, -1)

    @pl.when(c == 0)
    def _modulate_and_quant():
        xs = _modulated_ln(
            xcur_ref[...],
            lnw_ref[...].reshape(-1)[None, :],
            lnb_ref[...].reshape(-1)[None, :],
            mods_ref[0, 0],
            w,
            ln_eps,
        )
        a1, a2, sa1, sa2, corr = quant_rows_s8_pair(xs[:, :half], xs[:, half:])
        a1_ref[...] = a1
        a2_ref[...] = a2
        st_ref[:, 0:1] = sa1
        st_ref[:, 1:2] = sa2
        st_ref[:, 2:3] = corr

    a1 = a1_ref[...]
    a2 = a2_ref[...]
    sa1 = st_ref[:, 0:1]
    sa2 = st_ref[:, 1:2]
    corr = st_ref[:, 2:3]

    def mm(q_ref):
        qb = q_ref[...].reshape(q_ref.shape[-2], q_ref.shape[-1])
        return mm4_s8(qb, a1, a2, sa1, sa2, corr)

    g = mm(q1_ref) * s1_ref[...].reshape(-1)[None, :] + b1_ref[...].reshape(-1)[None, :]
    u = mm(q2_ref) * s2_ref[...].reshape(-1)[None, :] + b2_ref[...].reshape(-1)[None, :]
    h_ref[:, pl.ds(c * CH, CH)] = (jax.nn.silu(g) * u).astype(h_ref.dtype)

    @pl.when(c == pl.num_programs(2) - 1)
    def _down_and_residual():
        H = h_ref.shape[-1]
        Hh = H // 2
        hf = h_ref[...].astype(jnp.float32)
        b1q, b2q, sb1, sb2, corrh = quant_rows_s8_pair(hf[:, :Hh], hf[:, Hh:])
        b1_sref[...] = b1q
        b2_sref[...] = b2q
        KC = min(1024, Hh)
        n_k = Hh // KC

        def body(k, po):
            qb = q3_ref[0, pl.ds(k * KC, KC), :]
            bx = jax.lax.bitcast_convert_type(qb ^ jnp.uint8(0x80), jnp.int8)
            m = bx & jnp.int8(0xF)
            b1k = b1_sref[:, pl.ds(k * KC, KC)]
            b2k = b2_sref[:, pl.ds(k * KC, KC)]
            d1 = jax.lax.dot_general(b1k, m, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            d2 = jax.lax.dot_general(b2k, bx, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
            return po + d1.astype(jnp.float32) * sb1 + d2.astype(jnp.float32) * (sb2 * (1.0 / 16.0))

        po0 = jnp.zeros((h_ref.shape[0], w), jnp.float32)
        po = jax.lax.fori_loop(0, n_k, body, po0) - corrh
        po = po * s3_ref[...].reshape(-1)[None, :] + b3_ref[...].reshape(-1)[None, :]
        xcur_ref[...] += mods_ref[0, 0][:, 2 * w :] * po

        @pl.when(l == pl.num_programs(1) - 1)
        def _epilogue():
            _step_epilogue(
                s, xcur_ref, xlat_ref, o_ref, fmods_ref, wfin_ref, bfin_ref, meta_ref,
                ln_eps=ln_eps, compute_dtype=compute_dtype, cfg_rows=cfg_rows,
                n_img=n_img, renorm_channel=renorm_channel, num_steps=num_steps,
            )


def _sampler_q8(
    meta_ref,
    x0_ref,
    win_ref,
    binp_ref,
    lnw_ref,
    lnb_ref,
    q1_ref,  # (1, w, CH) s8 gate cols
    s1_ref,
    b1_ref,
    q2_ref,  # (1, w, CH) s8 up cols
    s2_ref,
    b2_ref,
    q3_ref,  # (1, CH, w) s8 down rows — chunked
    s3_ref,  # (1, 1, w)
    b3_ref,
    mods_ref,
    fmods_ref,
    wfin_ref,
    bfin_ref,
    o_ref,
    xlat_ref,  # VMEM f32 (Np, LAT)
    xcur_ref,  # VMEM f32 (Np, w)
    xs_ref,  # VMEM (Np, w) compute dtype: modulated input
    acc_ref,  # VMEM f32 (Np, w) block accumulator
    *,
    ln_eps: float,
    compute_dtype,
    cfg_rows: int,
    n_img: int,
    renorm_channel: bool,
    num_steps: int,
    s8_dots: bool,
):
    s = pl.program_id(0)
    l = pl.program_id(1)
    c = pl.program_id(2)
    w = xcur_ref.shape[-1]

    @pl.when((s == 0) & (l == 0) & (c == 0))
    def _load_noise():
        xlat_ref[...] = x0_ref[...]

    @pl.when((l == 0) & (c == 0))
    def _input_proj():
        xcur_ref[...] = jax.lax.dot_general(
            xlat_ref[...].astype(compute_dtype),
            win_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + binp_ref[...].reshape(1, -1)

    @pl.when(c == 0)
    def _modulate():
        xs = _modulated_ln(
            xcur_ref[...],
            lnw_ref[...].reshape(-1)[None, :],
            lnb_ref[...].reshape(-1)[None, :],
            mods_ref[0, 0],
            w,
            ln_eps,
        )
        xs_ref[...] = xs.astype(xs_ref.dtype)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if s8_dots:
        xq, sx = quant_rows_s8(xs_ref[...])
        w1 = q1_ref[...].reshape(q1_ref.shape[-2], q1_ref.shape[-1])
        w2 = q2_ref[...].reshape(q2_ref.shape[-2], q2_ref.shape[-1])
        g = mm8_s8(w1, xq, sx)
        u = mm8_s8(w2, xq, sx)
    else:
        xs = xs_ref[...]
        w1 = q1_ref[...].reshape(q1_ref.shape[-2], q1_ref.shape[-1]).astype(compute_dtype)
        w2 = q2_ref[...].reshape(q2_ref.shape[-2], q2_ref.shape[-1]).astype(compute_dtype)
        g = jax.lax.dot_general(xs, w1, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        u = jax.lax.dot_general(xs, w2, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    g = g * s1_ref[...].reshape(-1)[None, :] + b1_ref[...].reshape(-1)[None, :]
    u = u * s2_ref[...].reshape(-1)[None, :] + b2_ref[...].reshape(-1)[None, :]
    h = jax.nn.silu(g) * u  # (Np, CH) f32
    if s8_dots:
        hq, sh = quant_rows_s8(h)
        w3 = q3_ref[...].reshape(q3_ref.shape[-2], q3_ref.shape[-1])
        po = mm8_s8(w3, hq, sh)
    else:
        w3 = q3_ref[...].reshape(q3_ref.shape[-2], q3_ref.shape[-1]).astype(compute_dtype)
        po = jax.lax.dot_general(
            h.astype(compute_dtype), w3, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
    acc_ref[...] += po

    @pl.when(c == pl.num_programs(2) - 1)
    def _residual():
        po = acc_ref[...] * s3_ref[...].reshape(-1)[None, :] + b3_ref[...].reshape(-1)[None, :]
        xcur_ref[...] += mods_ref[0, 0][:, 2 * w :] * po

        @pl.when(l == pl.num_programs(1) - 1)
        def _epilogue():
            _step_epilogue(
                s, xcur_ref, xlat_ref, o_ref, fmods_ref, wfin_ref, bfin_ref, meta_ref,
                ln_eps=ln_eps, compute_dtype=compute_dtype, cfg_rows=cfg_rows,
                n_img=n_img, renorm_channel=renorm_channel, num_steps=num_steps,
            )


def rf_sampler_supported(params, B: int, cfg_rows: int) -> bool:
    """int8/int4 linear-scheme quantized res_blocks, 128-aligned dims, and a
    CFG layout whose rows fit one sublane tile group (Np covers all rows)."""
    from mingunivision_tpu.ops.kernels.rf_mlp import rf_mlp_supported

    if not rf_mlp_supported(params["res_blocks"]):
        return False
    if cfg_rows not in (1, 2, 3):
        return False
    return B % cfg_rows == 0


def rf_sample_fused(
    params,
    cfg,
    noise,  # (B, C) f32 — tiled block-major CFG rows (rf_sample built it)
    block_mods,  # (L, S, B, 3w)
    final_mods,  # (S, B, 2w)
    dts,  # (S,) f32
    text_cfg,
    image_cfg,
    *,
    cfg_rows: int,
    renorm_channel: bool,
    compute_dtype=jnp.bfloat16,
    chunk: int = 4096,  # round-5 sweep best: 1.087 ms/step vs 1.11-1.15 at 1024-2048/8192
    schedule: str = "block",  # int4 only: "block" (monolithic w3) | "pipelined"
    down_chunk: int = 1024,  # pipelined: packed w3 rows per down grid step
    interpret: bool = False,
):
    """One pallas_call for the whole Euler sample. Returns (B, C) f32."""
    blocks = params["res_blocks"]
    w12 = blocks["mlp"]["w12"]["w"]
    w3 = blocks["mlp"]["w3"]["w"]
    bits = w12.bits
    L, wq, h2 = w12.q.shape
    w = wq * 2 if bits == 4 else wq
    H = h2 // 2
    S = dts.shape[0]
    B, C = noise.shape
    n_img = B // cfg_rows
    assert C <= LAT

    CH = min(chunk, H)
    while H % CH:
        CH //= 2
    HC = H // CH

    Np = max(8, -(-B // 8) * 8)
    x0 = jnp.zeros((Np, LAT), jnp.float32).at[:B, :C].set(noise.astype(jnp.float32))
    mods_p = jnp.zeros((L, S, Np, 3 * w), jnp.float32).at[:, :, :B].set(
        block_mods.astype(jnp.float32)
    )
    fmods_p = jnp.zeros((S, Np, 2 * w), jnp.float32).at[:, :B].set(final_mods.astype(jnp.float32))
    meta = jnp.concatenate(
        [
            dts.astype(jnp.float32),
            jnp.stack([jnp.asarray(text_cfg, jnp.float32), jnp.asarray(image_cfg, jnp.float32)]),
        ]
    )

    # input/final projections may themselves be QuantizedArray (quantize_tree's
    # min-size threshold is below their 32x3072 size) — dequant to the compute
    # dtype host-side of the kernel; they're ~200 KB and VMEM-resident.
    from mingunivision_tpu.utils.quantize import dequant_weight

    ip = params["input_proj"]
    win = jnp.zeros((LAT, w), compute_dtype).at[:C].set(dequant_weight(ip["w"], compute_dtype))
    binp = (ip["b"].astype(jnp.float32) if "b" in ip else jnp.zeros((w,), jnp.float32)).reshape(1, w)
    fl = params["final_layer"]["linear"]
    wfin = jnp.zeros((w, LAT), compute_dtype).at[:, :C].set(dequant_weight(fl["w"], compute_dtype))
    bfin = jnp.zeros((1, LAT), jnp.float32).at[0, :C].set(
        fl["b"].astype(jnp.float32) if "b" in fl else 0.0
    )

    s12 = w12.s.astype(jnp.float32)  # (L, 1, 2H)
    s3v = w3.s.astype(jnp.float32)  # (L, 1, w)
    b12r = blocks["mlp"]["w12"]["b"].astype(jnp.float32).reshape(L, 1, h2)
    b3r = blocks["mlp"]["w3"]["b"].astype(jnp.float32).reshape(L, 1, w)

    def ws(up: bool):
        off = HC if up else 0
        # clamp keeps the LAST gate/up chunk resident (no DMA) during the
        # pipelined schedule's down phase (c >= HC); for the block schedule
        # c never exceeds HC-1 and the min is an identity
        return pl.BlockSpec((1, wq, CH), lambda s, l, c: (l, 0, off + jnp.minimum(c, HC - 1)))

    def srow(up: bool):
        off = HC if up else 0
        return pl.BlockSpec((1, 1, CH), lambda s, l, c: (l, 0, off + jnp.minimum(c, HC - 1)))

    common = dict(
        ln_eps=float(cfg.ln_eps),
        compute_dtype=compute_dtype,
        cfg_rows=cfg_rows,
        n_img=n_img,
        renorm_channel=renorm_channel,
        num_steps=S,
    )
    grid = (S, L, HC)
    if bits == 4 and schedule == "pipelined":
        KC = min(down_chunk, H // 2)
        while (H // 2) % KC:
            KC //= 2
        DC = (H // 2) // KC
        grid = (S, L, HC + DC)
        kernel = functools.partial(_sampler_q4_s8_pipelined, hc=HC, dc=DC, **common)
        w3_spec = pl.BlockSpec(
            (1, KC, w), lambda s, l, c: (l, jnp.maximum(c - HC, 0), 0)
        )
        scratch = [
            pltpu.VMEM((Np, LAT), jnp.float32),  # xlat
            pltpu.VMEM((Np, w), jnp.float32),  # xcur
            pltpu.VMEM((Np, w // 2), jnp.int8),
            pltpu.VMEM((Np, w // 2), jnp.int8),
            pltpu.VMEM((Np, H // 2), jnp.int8),
            pltpu.VMEM((Np, H // 2), jnp.int8),
            pltpu.VMEM((Np, 128), jnp.float32),
            pltpu.VMEM((Np, H), compute_dtype),  # h
            pltpu.VMEM((Np, w), jnp.float32),  # dacc
        ]
    elif bits == 4:
        kernel = functools.partial(_sampler_q4_s8, **common)
        w3_spec = pl.BlockSpec((1, H // 2, w), lambda s, l, c: (l, 0, 0))
        scratch = [
            pltpu.VMEM((Np, LAT), jnp.float32),  # xlat
            pltpu.VMEM((Np, w), jnp.float32),  # xcur
            pltpu.VMEM((Np, w // 2), jnp.int8),
            pltpu.VMEM((Np, w // 2), jnp.int8),
            pltpu.VMEM((Np, H // 2), jnp.int8),
            pltpu.VMEM((Np, H // 2), jnp.int8),
            pltpu.VMEM((Np, 128), jnp.float32),
            pltpu.VMEM((Np, H), compute_dtype),  # h
        ]
    else:
        from mingunivision_tpu.ops.kernels.rf_mlp import INT8_INT_DOTS

        kernel = functools.partial(_sampler_q8, s8_dots=INT8_INT_DOTS, **common)
        w3_spec = pl.BlockSpec((1, CH, w), lambda s, l, c: (l, c, 0))
        scratch = [
            pltpu.VMEM((Np, LAT), jnp.float32),
            pltpu.VMEM((Np, w), jnp.float32),
            pltpu.VMEM((Np, w), compute_dtype),  # xs
            pltpu.VMEM((Np, w), jnp.float32),  # acc
        ]

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # meta
            pl.BlockSpec((Np, LAT), lambda s, l, c: (0, 0)),
            pl.BlockSpec((LAT, w), lambda s, l, c: (0, 0)),
            pl.BlockSpec((1, w), lambda s, l, c: (0, 0)),
            pl.BlockSpec((1, 1, w), lambda s, l, c: (l, 0, 0)),
            pl.BlockSpec((1, 1, w), lambda s, l, c: (l, 0, 0)),
            ws(False),
            srow(False),
            srow(False),
            ws(True),
            srow(True),
            srow(True),
            w3_spec,
            pl.BlockSpec((1, 1, w), lambda s, l, c: (l, 0, 0)),
            pl.BlockSpec((1, 1, w), lambda s, l, c: (l, 0, 0)),
            pl.BlockSpec((1, 1, Np, 3 * w), lambda s, l, c: (l, s, 0, 0)),
            pl.BlockSpec((1, Np, 2 * w), lambda s, l, c: (s, 0, 0)),
            pl.BlockSpec((w, LAT), lambda s, l, c: (0, 0)),
            pl.BlockSpec((1, LAT), lambda s, l, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec((Np, LAT), lambda s, l, c: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, LAT), jnp.float32),
        scratch_shapes=scratch if PALLAS_TPU else [],
        interpret=interpret,
        **(
            {
                "compiler_params": pltpu.CompilerParams(
                    dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
                    vmem_limit_bytes=110 * 1024 * 1024,
                )
            }
            if (PALLAS_TPU and not interpret)
            else {}
        ),
    )(
        meta,
        x0,
        win,
        binp,
        blocks["in_ln"]["w"].astype(jnp.float32).reshape(L, 1, w),
        blocks["in_ln"]["b"].astype(jnp.float32).reshape(L, 1, w),
        w12.q,
        s12,
        b12r,
        w12.q,
        s12,
        b12r,
        w3.q,
        s3v,
        b3r,
        mods_p,
        fmods_p,
        wfin,
        bfin,
    )
    return out[:B, :C]
