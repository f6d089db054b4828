"""Pallas TPU kernels for the serving hot paths.

xattn_int8 — fused int8 cross-attention for incremental Whisper decode.
The decode loop re-reads the ENTIRE precomputed cross-attention K/V
([B, 1500, D] per layer) every step; on large-v3 that is the decode
stage's bound resource and, unlike the weights, it scales with the batch.
XLA cannot consume int8 attention memories without materializing a
dequantized f32/bf16 copy per step (measured: the convert+multiply
dominates the while-loop body, tools/bench_decode_real.py), so this
kernel streams the int8 bytes HBM->VMEM once and dequantizes in
registers: logits and attention-value dots read int8 directly (k-scales
are pre-folded into q by the caller; v-scales applied on the [T, D]
output tile). Traffic per (layer, step) is exactly the int8 K/V bytes.

masked_scm_pallas — fused masked spatial-covariance accumulation
(the MVDR front half, mvdr_util.py:58-66 equivalent):

    R[b,k,f] = sum_t wta[b,f,t,k] * x[b,f,t,:] x[b,f,t,:]^H

Layout notes (the part that matters on TPU): the contraction axis T sits in
the lane dimension (padded 186->256) and the tiny mic axis M=7 in sublanes,
so each grid cell streams [Fb, M, T] tiles through VMEM instead of
lane-padding the M=7 axis (which inflates a 1.3 MB window to 48 MB).
F is zero-padded to a multiple of the block size outside the kernel
(zero WTA weight -> zero contribution).

Measured on v5e the XLA einsum formulation of this op is already cheap
(~2.7 ms per 8-segment chunk), so the kernel is wired behind a flag rather
than as the default — it exists as the Pallas implementation of record for
this op and is unit-tested in interpret mode on CPU.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _xattn_int8_kernel(q_ref, k_ref, v_ref, vs_ref, o_ref, *, dk: int,
                       s_valid: int):
    """One batch row's cross-attention against int8 memory.

    Blocks: q [1, T, D] bf16 (k-scales + d_k**-0.5 factors pre-folded);
    k/v [1, S_pad, D] int8 (rows >= s_valid are zero padding); vs [1, D]
    f32 v-scales; out [1, T, D] f32.

    Heads are processed in 128-lane groups (g = 128//dk heads per group,
    whisper large: dk=64 -> 2) so every VMEM lane slice is tile-aligned;
    within a group, head i's logits come from a dot with q's other lanes
    zeroed (exact: the contraction only sees head i's channels). ALL
    heads' logit rows are stacked into ONE [H*T, S_pad] block so the
    masked softmax runs once per cell rather than once per head — at
    decode (T=1) a per-head softmax burns 8x its VPU work on sublane
    padding, which made the softmax, not the DMA, the kernel's wall —
    and each group consumes one attention-value dot ([g*T, S] x
    [S, g*dk]) with head i's rows selected back onto its own lanes."""
    q = q_ref[0]                                   # [T, D] bf16
    k = k_ref[0]                                   # [S_pad, D] int8
    v = v_ref[0]
    vs = vs_ref[0, 0]                              # [D] f32 (via [1,1,D])
    T, D = q.shape
    S_pad = k.shape[0]
    lanes = min(D, 128)
    g = max(lanes // dk, 1)
    n_groups = D // (g * dk)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (T, g * dk), 1)
    lane_head = lane_iota // dk

    # pass 1: logits, all heads stacked
    rows = []
    for grp in range(n_groups):
        sl = slice(grp * g * dk, (grp + 1) * g * dk)
        qg = q[:, sl]                              # [T, g*dk] bf16
        kg = k[:, sl].astype(jnp.bfloat16)         # [S_pad, g*dk]
        for i in range(g):
            qi = jnp.where(lane_head == i, qg, jnp.bfloat16(0.0))
            rows.append(jax.lax.dot_general(
                qi, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))      # [T, S_pad]
    lg = rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)
    HT = lg.shape[0]                               # n_groups * g * T
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (HT, S_pad), 1)
    lg = jnp.where(s_iota >= s_valid, -1e30, lg)
    m = jnp.max(lg, axis=-1, keepdims=True)
    p = jnp.exp(lg - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(jnp.bfloat16)

    # pass 2: one value dot per group (v converted group-by-group so the
    # bf16 temps never hold more than one [S_pad, 128] slice)
    outs = []
    for grp in range(n_groups):
        sl = slice(grp * g * dk, (grp + 1) * g * dk)
        vg = v[:, sl].astype(jnp.bfloat16)         # [S_pad, g*dk]
        pg = p[grp * g * T:(grp + 1) * g * T]      # [g*T, S_pad]
        ov = jax.lax.dot_general(
            pg, vg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [g*T, g*dk]
        og = ov[:T]
        for i in range(1, g):
            og = jnp.where(lane_head == i, ov[i * T:(i + 1) * T], og)
        outs.append(og)
    o = outs[0] if n_groups == 1 else jnp.concatenate(outs, axis=-1)
    o_ref[0] = o * vs[None, :]


@functools.partial(jax.jit, static_argnames=("dk", "s_valid", "interpret"))
def xattn_int8(q_eff: jnp.ndarray, k8: jnp.ndarray, v8: jnp.ndarray,
               v_scale: jnp.ndarray, dk: int, s_valid: int,
               interpret: bool = False) -> jnp.ndarray:
    """Fused int8 cross-attention (decode path).

    q_eff: [B, T, D] bf16 — query with per-channel k-scales AND the two
    d_k**-0.25 attention scale factors already folded in;
    k8/v8: [B, S_pad, D] int8 (S_pad a multiple of 32, zero-padded past
    s_valid); v_scale: [B, D] f32. Returns [B, T, D] f32 attention output
    (pre-out-projection), v-scales applied.

    Grid is (B,): one whole-row cell per batch element. A (B, D//128)
    lane-group grid was tried and measured 2x SLOWER (88 GB/s): 10x the
    grid cells means 10x the DMA descriptors and per-cell fixed costs,
    which dwarf the double-buffering win at these block sizes.
    """
    B, T, D = q_eff.shape
    S_pad = k8.shape[1]
    assert S_pad % 32 == 0 and k8.dtype == jnp.int8
    # [B, 1, D]: trailing block dims must equal the array's (TPU tiling)
    v_scale3 = v_scale.reshape(B, 1, D)
    kern = functools.partial(_xattn_int8_kernel, dk=dk, s_valid=s_valid)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, D), jnp.float32),
        interpret=interpret,
    )(q_eff, k8, v8, v_scale3)


def _attn_step_kernel(pos_ref, pad_ref, q_ref, k_ref, v_ref, o_ref, *,
                      dk: int):
    """One batch row's single-token self-attention against its KV cache.

    Blocks: q [1, 1, D] (compute dtype, both d_k**-0.25 factors already
    folded in — the cache-side factor is exact because the kernel applies
    no k scaling); k/v [1, ctx, D] cache rows (position pos already
    written by the caller's dynamic_update_slice); out [1, 1, D] f32.
    pos_ref/pad_ref: SMEM scalars — current cache slot and this row's
    left-pad width (masked prompt slots; see TextDecoder pad_lens).

    Mask (matching TextDecoder's suffix-decode mask exactly): key s is
    visible iff s <= pos and (s >= pad or s == pos).

    Heads are processed in 128-lane groups exactly like _xattn_int8_kernel
    (g = 128//dk heads per group): per group a [g, g*dk] q-row block (head
    i's lanes live only in row i) dots against the cache slice — ONE MXU
    dot per group for logits and one for the attention-value product, with
    all heads' logit rows stacked into a single [H, ctx] block so the
    masked softmax runs once per cell."""
    q = q_ref[0]                                   # [1, D] compute dtype
    k = k_ref[0]                                   # [ctx, D]
    v = v_ref[0]
    pos = pos_ref[0]
    pad = pad_ref[pl.program_id(0)]
    ctx, D = k.shape
    lanes = min(D, 128)
    g = max(lanes // dk, 1)
    n_groups = D // (g * dk)
    H = D // dk
    # same structure as _xattn_int8_kernel at T=1 (all row ops stay
    # [1, 128-multiple] — Mosaic rejects sublane broadcasts of 1-row
    # vectors, so heads are masked one [1, g*dk] row at a time)
    lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, g * dk), 1) // dk

    rows = []
    for grp in range(n_groups):
        sl = slice(grp * g * dk, (grp + 1) * g * dk)
        qg = q[:, sl]                              # [1, g*dk]
        kg = k[:, sl]                              # [ctx, g*dk]
        for i in range(g):
            qi = jnp.where(lane_head == i, qg, jnp.zeros((), qg.dtype))
            rows.append(jax.lax.dot_general(
                qi, kg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32))      # [1, ctx]
    lg = rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)
    # mask: s <= pos and (s >= pad or s == pos) — shared across head rows
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (H, ctx), 1)
    visible = (s_iota <= pos) & ((s_iota >= pad) | (s_iota == pos))
    lg = jnp.where(visible, lg, -1e30)
    m = jnp.max(lg, axis=-1, keepdims=True)
    p = jnp.exp(lg - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)

    outs = []
    for grp in range(n_groups):
        sl = slice(grp * g * dk, (grp + 1) * g * dk)
        vg = v[:, sl]                              # [ctx, g*dk]
        pg = p[grp * g:(grp + 1) * g]              # [g, ctx]
        ov = jax.lax.dot_general(
            pg, vg, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)    # [g, g*dk]
        # head i's output lives in row i's lane range — collapse rows
        # (lane_head maps lane -> head index within the group, so the
        # where() selects row i exactly on head i's lanes)
        og = ov[0:1]                               # [1, g*dk]
        for i in range(1, g):
            og = jnp.where(lane_head == i, ov[i:i + 1], og)
        outs.append(og)
    o = outs[0] if n_groups == 1 else jnp.concatenate(outs, axis=-1)
    o_ref[0] = o


@functools.partial(jax.jit, static_argnames=("dk", "interpret"))
def attn_step(q_eff: jnp.ndarray, k_cache: jnp.ndarray,
              v_cache: jnp.ndarray, pos: jnp.ndarray, pad_lens: jnp.ndarray,
              dk: int, interpret: bool = False) -> jnp.ndarray:
    """Fused single-token KV-cache self-attention (decode path).

    q_eff: [B, 1, D] with the full d_k**-0.5 attention scaling folded in;
    k_cache/v_cache: [B, ctx, D] (current token already written at pos);
    pos: [] int32 cache slot of this token (uniform across rows);
    pad_lens: [B] int32 masked left-pad widths (zeros when prompts are
    uniform). Returns [B, 1, D] f32 attention output pre-out-projection.

    Replaces the einsum formulation for T=1 decode steps: XLA lowers the
    per-(batch, head) [1, dk] x [ctx, dk] logits/value contractions to
    B*H tiny MXU ops per layer whose issue overhead — not bytes — owns
    the measured 9.8 ms/step residual at B=24 (tools/bench_decode_real
    --ablate; the weights+cache roofline is ~1.5 ms). One grid cell per
    row streams the row's cache once and runs 2 dots per 128-lane head
    group."""
    B, T, D = q_eff.shape
    assert T == 1
    ctx = k_cache.shape[1]
    pos1 = jnp.reshape(jnp.asarray(pos, jnp.int32), (1,))
    pads = pad_lens.astype(jnp.int32).reshape(B)
    kern = functools.partial(_attn_step_kernel, dk=dk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 1, D), lambda b, pos_r, pad_r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ctx, D), lambda b, pos_r, pad_r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ctx, D), lambda b, pos_r, pad_r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, D), lambda b, pos_r, pad_r: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
        interpret=interpret,
    )(pos1, pads, q_eff, k_cache, v_cache)


def _attn_step_split_kernel(q_ref, kp_ref, vp_ref, kg_ref, vg_ref,
                            bias_ref, o_ref, *, dk: int):
    """One STREAM's beam-search decode-step attention against a split
    cache: a prompt segment shared by the stream's K beams (read ONCE per
    stream -- beams fold like the cross-attention memory) plus a per-beam
    generated segment.

    Blocks: q [1, K, D] the stream's beam queries (full d_k**-0.5
    folded); kp/vp [1, Pp, D] the stream's prompt cache; kg/vg
    [1, K*G, D] the stream's per-beam generated caches laid out
    beam-major (current token already written at gslot); bias
    [1, K, Pp+K*G] f32 additive visibility mask (0 visible / -1e30 not),
    built by the wrapper from (pad, gslot, beam) -- the kernel contains
    no iota/mask ARITHMETIC beyond the lane->head map. Out [1, K, D] f32.

    Heads fold into ONE pair of full-width MXU dots via block-diagonal q
    packing: row h*K+j holds beam j's query with only head h's dk lanes
    non-zero, so q'[(h,j),:] . key[s,:] contracts exactly head h's
    channels ([H*K, D] x [ncol, D]^T logits, [H*K, ncol] x [ncol, D]
    values). The H-fold MXU padding is irrelevant at decode sizes
    (~5 GFLOP/layer at B=8 K=5 D=1280 vs a ~40 us bytes roofline). The
    pack and the output's diagonal collapse happen IN VMEM (H masked
    selects each) -- a wrapper-side XLA pack/unpack materialized
    [B, H*K, D] bf16+f32 tensors through HBM every layer-step, ~450 MB
    at the parity-recipe shape.

    The lane->head iota is built [1, D] and row-concatenated: Mosaic can
    lower neither a (K, D) dim-1 broadcasted_iota (sublane broadcast of a
    partial vreg) nor boolean/sub-8-row concats, while int/f32 [1, n] and
    [K, n] row concats lower fine."""
    kp = kp_ref[0]                                 # [Pp, D]
    keys = jnp.concatenate([kp, kg_ref[0]], axis=0)    # [ncol, D]
    vals = jnp.concatenate([vp_ref[0], vg_ref[0]], axis=0)
    q2 = q_ref[0]                                  # [K, D]
    K, D = q2.shape
    H = D // dk
    bias = bias_ref[0]                             # [K, ncol]

    lane_head1 = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1) // dk
    lane_head_k = lane_head1 if K == 1 else \
        jnp.concatenate([lane_head1] * K, axis=0)  # [K, D]
    zero = jnp.zeros((), q2.dtype)
    pieces = [jnp.where(lane_head_k == h, q2, zero) for h in range(H)]
    qp = pieces[0] if H == 1 else jnp.concatenate(pieces, axis=0)

    lg = jax.lax.dot_general(qp, keys, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # rows stack head-major (row = h*K + j), so tiling the per-beam bias
    # H times row-wise aligns beam j with every head's row j
    full_bias = bias if H == 1 else jnp.concatenate([bias] * H, axis=0)
    lg = lg + full_bias
    m = jnp.max(lg, axis=-1, keepdims=True)
    p = jnp.exp(lg - m)
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(vals.dtype)
    ov = jax.lax.dot_general(p, vals, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # [HK, D]
    # block-diagonal collapse: beam j's head-h lanes come from row h*K+j
    og = ov[0:K]
    for h in range(1, H):
        og = jnp.where(lane_head_k == h, ov[h * K:(h + 1) * K], og)
    o_ref[0] = og


@functools.partial(jax.jit, static_argnames=("dk", "beams", "interpret"))
def attn_step_split(q_eff: jnp.ndarray, k_prompt: jnp.ndarray,
                    v_prompt: jnp.ndarray, k_gen: jnp.ndarray,
                    v_gen: jnp.ndarray, gslot: jnp.ndarray,
                    pad_lens: jnp.ndarray, dk: int, beams: int,
                    anc: jnp.ndarray = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Beam-search decode-step self-attention over a split KV cache.

    q_eff: [B*K, 1, D] with d_k**-0.5 folded (beam-major within stream:
    row b*K+j = stream b, beam j); k_prompt/v_prompt: [B, Pp, D] the
    per-stream prompt cache (identical across a stream's beams -- written
    once at prefill, NEVER reordered); k_gen/v_gen: [B*K, G, D] per-beam
    generated caches with the current token already written at gslot;
    gslot: [] int32; pad_lens: [B] per-stream masked left-pad widths;
    anc: optional [B, K, G] int32 ancestry -- anc[b, j, s] is the
    PHYSICAL row (0..K-1) whose slot-s K/V belongs to logical beam j's
    history. Returns [B*K, 1, D] f32.

    Motivation (measured): beam search's per-step cost was dominated by
    the full-width per-step cache reorder gather. Splitting the
    prompt/generated segments removed the prompt from the gather and let
    each stream's prompt keys be read ONCE for all K beams (19.1 ->
    12.8 ms/step at 9 streams x 5 beams); the ancestry mask then removes
    the remaining [BK, G, D] x2 x layers gather ENTIRELY: the kernel
    already loads every beam's generated cache per stream, so beam
    reordering is just a different visibility bias -- values never move,
    the caches stay in-place loop carries (in-place DUS), and the only
    per-step reorder is the [B, K, G] int32 ancestry matrix itself.

    Visibility: prompt col c iff c >= pad[stream]; generated col (j', s)
    iff s <= gslot and j' == (anc[b, j, s] if anc is given else j). The
    mask is built HERE as an additive f32 bias (XLA, fused, trivial
    bytes -- [B, K, ncol] per step, reused by all layers)."""
    BK, T, D = q_eff.shape
    assert T == 1 and BK % beams == 0
    K = beams
    B = BK // K
    Pp = k_prompt.shape[1]
    G = k_gen.shape[1]
    ncol = Pp + K * G

    colp = jnp.arange(Pp)
    beam_ids = jnp.arange(K)
    s_ok = jnp.arange(G) <= gslot
    vis_p = jnp.broadcast_to(
        (colp[None, :] >= pad_lens[:, None])[:, None, :], (B, K, Pp))
    if anc is None:
        eq = jnp.broadcast_to(
            (beam_ids[:, None] == beam_ids[None, :])[None, :, :, None],
            (B, K, K, G))
    else:
        eq = anc[:, :, None, :] == beam_ids[None, None, :, None]
    vis_g = (eq & s_ok[None, None, None, :]).reshape(B, K, K * G)
    bias = jnp.where(jnp.concatenate([vis_p, vis_g], axis=-1),
                     jnp.float32(0), jnp.float32(-1e30))

    q3 = q_eff.reshape(B, K, D)
    kg_r = k_gen.reshape(B, K * G, D)
    vg_r = v_gen.reshape(B, K * G, D)

    kern = functools.partial(_attn_step_split_kernel, dk=dk)
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, K, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Pp, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K * G, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K * G, D), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, ncol), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, D), jnp.float32),
        interpret=interpret,
    )(q3, k_prompt, v_prompt, kg_r, vg_r, bias)
    return out.reshape(BK, 1, D)


def _dwconv1d_kernel(x_ref, w_ref, o_ref, *, k: int):
    """One batch row's depthwise conv. Blocks: x [1, T+k-1, C] bf16
    (caller pre-pads time by (k-1)//2 each side); w [k, C] f32;
    out [1, T, C] f32. out[t, c] = sum_i x[t+i, c] * w[i, c] — k shifted
    VPU FMAs over a [T, C] tile held in registers/VMEM."""
    xp = x_ref[0]                                   # [T+k-1, C]
    w = w_ref[...]                                  # [k, C] f32
    T = o_ref.shape[1]
    acc = jnp.zeros((T, xp.shape[1]), jnp.float32)
    for i in range(k):
        acc = acc + xp[i:i + T, :].astype(jnp.float32) * w[i][None, :]
    o_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def depthwise_conv1d(x: jnp.ndarray, w: jnp.ndarray, k: int,
                     interpret: bool = False) -> jnp.ndarray:
    """'Same'-padded depthwise conv over time, one batch row per grid step.

    x: [B, T, C]; w: [k, C] per-channel taps (flax Conv feature_group_
    count=C kernel [k, 1, C] squeezed). Returns [B, T, C] f32, exactly
    nn.Conv(C, (k,), feature_group_count=C, use_bias=False)(x).

    XLA lowers channels-as-groups conv to ~2.3 ms per [256, 304, 1024]
    tile on v5e — 2.3x its HBM roofline — and TitaNet-large runs 11 of
    them per forward, so the grouped convs cost more than all of the
    model's matmuls combined (tools/bench_depthwise.py). This kernel
    streams each row once and does the k taps as in-register FMAs."""
    B, T, C = x.shape
    pad = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (pad, k - 1 - pad), (0, 0)))
    kern = functools.partial(_dwconv1d_kernel, k=k)
    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, T + k - 1, C), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, C), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.float32),
        interpret=interpret,
    )(xp, w.astype(jnp.float32))


def _scm_kernel(wta_ref, xr_ref, xi_ref, rr_ref, ri_ref):
    """Blocks: wta [1,1,Fb,T]; xr/xi [1,Fb,M,T]; out [1,1,Fb,M,M]."""
    w = wta_ref[0, 0]              # [Fb, T]
    xr = xr_ref[0]                 # [Fb, M, T]
    xi = xi_ref[0]
    wxr = xr * w[:, None, :]
    wxi = xi * w[:, None, :]
    rr = jnp.einsum("fmt,fnt->fmn", wxr, xr,
                    preferred_element_type=jnp.float32) + \
         jnp.einsum("fmt,fnt->fmn", wxi, xi,
                    preferred_element_type=jnp.float32)
    ri = jnp.einsum("fmt,fnt->fmn", wxi, xr,
                    preferred_element_type=jnp.float32) - \
         jnp.einsum("fmt,fnt->fmn", wxr, xi,
                    preferred_element_type=jnp.float32)
    rr_ref[0, 0] = rr
    ri_ref[0, 0] = ri


@functools.partial(jax.jit, static_argnames=("f_block", "interpret"))
def masked_scm_pallas(wta: jnp.ndarray, stft_c: jnp.ndarray,
                      f_block: int = 32, interpret: bool = False
                      ) -> jnp.ndarray:
    """wta: [B, F, T, K] float32; stft_c: [B, F, T, M] complex64.

    Returns regularized SCMs [B, K, F, M, M] complex64 (+1e-15*I, parity
    with mvdr_util.py:65).
    """
    B, F, T, K = wta.shape
    M = stft_c.shape[-1]
    F_pad = ((F + f_block - 1) // f_block) * f_block

    xr = jnp.moveaxis(jnp.real(stft_c), 3, 2)   # [B, F, M, T]
    xi = jnp.moveaxis(jnp.imag(stft_c), 3, 2)
    wta_t = jnp.moveaxis(wta, 3, 1)              # [B, K, F, T]
    if F_pad != F:
        pf = F_pad - F
        xr = jnp.pad(xr, ((0, 0), (0, pf), (0, 0), (0, 0)))
        xi = jnp.pad(xi, ((0, 0), (0, pf), (0, 0), (0, 0)))
        wta_t = jnp.pad(wta_t, ((0, 0), (0, 0), (0, pf), (0, 0)))

    grid = (B, K, F_pad // f_block)
    out_shape = [jax.ShapeDtypeStruct((B, K, F_pad, M, M), jnp.float32),
                 jax.ShapeDtypeStruct((B, K, F_pad, M, M), jnp.float32)]
    rr, ri = pl.pallas_call(
        _scm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, f_block, T), lambda b, k, f: (b, k, f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_block, M, T), lambda b, k, f: (b, f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_block, M, T), lambda b, k, f: (b, f, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, f_block, M, M),
                         lambda b, k, f: (b, k, f, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, f_block, M, M),
                         lambda b, k, f: (b, k, f, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(wta_t, xr, xi)
    scm = jax.lax.complex(rr[:, :, :F], ri[:, :, :F])
    eye = jnp.eye(M, dtype=scm.dtype)
    return scm + 1e-15 * eye


def _encoder_mha_kernel(q_ref, k_ref, v_ref, o_ref, *, s_valid: int):
    """One (batch*head, q-block) cell of unmasked bidirectional MHA.

    Blocks: q [1, Tq, dk] bf16 and k/v [1, S_pad, dk] bf16 (both already
    scaled by d_k**-0.25, matching the einsum path's operand rounding);
    out [1, Tq, dk] f32. The ENTIRE key/value sequence lives in VMEM
    (whisper encode: [1536, 64] bf16 = 192 KB each), so no online-softmax
    running rescale is needed — logits for the full row are materialized
    in a [Tq, S_pad] f32 register block, softmaxed once (f32, exactly the
    einsum path's math), and consumed by the attention-value dot without
    ever touching HBM. Keys past s_valid are zero padding; their logits
    are masked to -1e30 before the softmax."""
    q = q_ref[0]                                   # [Tq, dk] bf16
    k = k_ref[0]                                   # [S_pad, dk] bf16
    v = v_ref[0]
    lg = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    S_pad = k.shape[0]
    if s_valid < S_pad:
        s_iota = jax.lax.broadcasted_iota(jnp.int32, lg.shape, 1)
        lg = jnp.where(s_iota >= s_valid, -1e30, lg)
    m = jnp.max(lg, axis=-1, keepdims=True)
    p = jnp.exp(lg - m)
    # weights cast to the value dtype — the einsum path's
    # w.astype(vh.dtype), so f32 models keep f32 parity
    p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(v.dtype)
    o = jax.lax.dot_general(p, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # output in the value dtype: the consumer (out-projection Dense)
    # casts to it anyway, so this is the same rounding point as the
    # einsum path — and it halves the kernel's store traffic
    o_ref[0] = o.astype(o_ref.dtype)


def encoder_mha(qh: jnp.ndarray, kh: jnp.ndarray, vh: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """Fused unmasked self-attention for long-context encoders.

    qh/kh/vh: [BH, S, dk], attention scale already folded into q and
    k by the caller. Returns [BH, S, dk] in the value dtype.

    Replaces the XLA einsum formulation for the whisper encoder
    (models/whisper.py::MHA), whose [B, H, 1500, 1500] f32 logits tensor
    is the encode stage's dominant HBM stream (~4.3 GB per layer at
    B=24). Measured at the large-v3 encode shape (B=24, H=20, S=1500,
    dk=64, v5e): einsum 17.5 ms/layer -> fused 9.2 ms/layer. The
    remainder is per-element physics, not overhead (flat across block
    sizes 256..1536): the QK dot contracts dk=64 (half the MXU's 128
    rows -> ~2.8 ms), plus ~3.5 ms of f32 softmax VPU passes. The stock
    pallas flash_attention kernel measured 40 ms/layer at this shape
    (online-softmax machinery + segment-id masking it doesn't need);
    keeping all of K/V resident per cell removes both. Deferring the
    softmax normalization into the output tile measured only 0.5 ms
    more and perturbs numerics -- not taken.
    """
    BH, S, dk = qh.shape
    blk = 512
    S_pad = ((S + blk - 1) // blk) * blk
    if S_pad != S:
        pad = ((0, 0), (0, S_pad - S), (0, 0))
        qh, kh, vh = (jnp.pad(x, pad) for x in (qh, kh, vh))
    # q blocks of 768 when divisible (fewer, larger cells), else 512
    tq = 768 if S_pad % 768 == 0 else blk
    kern = functools.partial(_encoder_mha_kernel, s_valid=S)
    out = pl.pallas_call(
        kern,
        grid=(BH, S_pad // tq),
        in_specs=[
            pl.BlockSpec((1, tq, dk), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, dk), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, S_pad, dk), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, dk), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, S_pad, dk), vh.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(qh, kh, vh)
    return out[:, :S]
