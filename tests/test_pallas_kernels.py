"""Pallas kernel tests (interpret mode on the CPU mesh; the same kernels
compile natively on TPU — benchmarked at parity with the XLA einsum)."""
import jax
import jax.numpy as jnp
import numpy as np

from notsofar_tpu.ops.mvdr import make_wta, masked_scm
from notsofar_tpu.ops.pallas_kernels import masked_scm_pallas


def test_masked_scm_pallas_matches_einsum():
    rng = np.random.RandomState(0)
    B, F, T, M, S = 2, 257, 186, 7, 3
    spk = jnp.asarray(rng.rand(B, F, T, S).astype(np.float32))
    noi = jnp.asarray(rng.rand(B, F, T, 1).astype(np.float32))
    x = jax.lax.complex(
        jnp.asarray(rng.randn(B, F, T, M).astype(np.float32)),
        jnp.asarray(rng.randn(B, F, T, M).astype(np.float32)))
    wta = make_wta(spk, noi)
    want = np.asarray(masked_scm(wta, x))
    got = np.asarray(masked_scm_pallas(wta, x, interpret=True))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 1e-5
    # hermitian + regularized diagonal preserved
    np.testing.assert_allclose(got, got.conj().swapaxes(-1, -2),
                               rtol=1e-5, atol=1e-5)


def test_masked_scm_pallas_small_shapes():
    rng = np.random.RandomState(1)
    B, F, T, M, S = 1, 9, 40, 7, 3  # F not a multiple of the block
    spk = jnp.asarray(rng.rand(B, F, T, S).astype(np.float32))
    noi = jnp.asarray(rng.rand(B, F, T, 1).astype(np.float32))
    x = jax.lax.complex(
        jnp.asarray(rng.randn(B, F, T, M).astype(np.float32)),
        jnp.asarray(rng.randn(B, F, T, M).astype(np.float32)))
    wta = make_wta(spk, noi)
    want = np.asarray(masked_scm(wta, x))
    got = np.asarray(masked_scm_pallas(wta, x, f_block=8, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_xattn_int8_matches_per_head_attention():
    """Fused int8 cross-attention == per-head f64 softmax attention on the
    dequantized memory (the only error left is the bf16 q/p rounding)."""
    from notsofar_tpu.ops.pallas_kernels import xattn_int8

    rng = np.random.RandomState(4)
    for B, T, D, dk, S, s_valid in [(2, 1, 256, 64, 96, 77),
                                    (2, 5, 384, 64, 96, 77),
                                    (1, 1, 128, 128, 32, 20)]:
        q = jnp.asarray(rng.randn(B, T, D).astype(np.float32) * 0.2
                        ).astype(jnp.bfloat16)
        k8 = jnp.asarray(rng.randint(-127, 128, (B, S, D)).astype(np.int8))
        v8 = jnp.asarray(rng.randint(-127, 128, (B, S, D)).astype(np.int8))
        k8 = k8.at[:, s_valid:].set(0)
        v8 = v8.at[:, s_valid:].set(0)
        vs = jnp.asarray(rng.rand(B, D).astype(np.float32) * 0.01)
        got = np.asarray(xattn_int8(q, k8, v8, vs, dk, s_valid,
                                    interpret=True))
        qf = np.asarray(q.astype(jnp.float32), np.float64)
        kf = np.asarray(k8, np.float64)
        vf = np.asarray(v8, np.float64)
        ref = np.zeros((B, T, D))
        for b in range(B):
            for h in range(D // dk):
                sl = slice(h * dk, (h + 1) * dk)
                logit = qf[b][:, sl] @ kf[b][:, sl].T
                logit[:, s_valid:] = -np.inf
                p = np.exp(logit - logit.max(-1, keepdims=True))
                p /= p.sum(-1, keepdims=True)
                ref[b][:, sl] = p @ vf[b][:, sl]
        ref *= np.asarray(vs)[:, None, :]
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        assert err < 5e-3, (B, T, D, dk, err)


def test_depthwise_conv1d_matches_grouped_conv():
    """depthwise_conv1d == nn.Conv(feature_group_count=C) bit-for-intent
    (f32 accumulate vs conv's f32 preferred type; 1e-5 rel)."""
    import flax.linen as nn
    from notsofar_tpu.ops.pallas_kernels import depthwise_conv1d

    rng = np.random.RandomState(2)
    B, T, C = 3, 40, 256
    for k in (3, 7, 15):
        x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
        w = jnp.asarray(rng.randn(k, 1, C).astype(np.float32) * 0.2)
        conv = nn.Conv(C, kernel_size=(k,), padding=[((k - 1) // 2,
                                                      (k - 1) // 2)],
                       feature_group_count=C, use_bias=False)
        want = np.asarray(conv.apply({"params": {"kernel": w}}, x))
        got = np.asarray(depthwise_conv1d(x, w[:, 0, :], k,
                                          interpret=True))
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 1e-5, (k, rel)


def test_titanet_depthwise_module_matches_nn_conv():
    """The DepthwiseConv module's lax path (the non-TPU branch tests run
    on) equals flax nn.Conv with the same param tree."""
    import flax.linen as nn
    from notsofar_tpu.models.titanet import DepthwiseConv

    rng = np.random.RandomState(3)
    B, T, C, k = 2, 50, 128, 7
    x = jnp.asarray(rng.randn(B, T, C).astype(np.float32))
    w = jnp.asarray(rng.randn(k, 1, C).astype(np.float32) * 0.2)
    mod = DepthwiseConv(k)
    got = np.asarray(mod.apply({"params": {"kernel": w}}, x))
    conv = nn.Conv(C, kernel_size=(k,), padding=[((k - 1) // 2,) * 2],
                   feature_group_count=C, use_bias=False)
    want = np.asarray(conv.apply({"params": {"kernel": w}}, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_encoder_mha_matches_einsum():
    """Fused encoder self-attention vs the MHA einsum formulation,
    including the S -> S_pad key padding mask (621 pads to 1024)."""
    from notsofar_tpu.ops.pallas_kernels import encoder_mha
    rng = np.random.RandomState(7)
    BH, S, dk = 6, 621, 64
    scale = dk ** -0.25
    q = jnp.asarray(rng.randn(BH, S, dk).astype(np.float32) * 0.3
                    ).astype(jnp.bfloat16)
    k = jnp.asarray(rng.randn(BH, S, dk).astype(np.float32) * 0.3
                    ).astype(jnp.bfloat16)
    v = jnp.asarray(rng.randn(BH, S, dk).astype(np.float32) * 0.3
                    ).astype(jnp.bfloat16)

    lg = jnp.einsum("btd,bsd->bts", q * scale, k * scale,
                    preferred_element_type=jnp.float32)
    w = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)
    want = np.asarray(jnp.einsum("bts,bsd->btd", w.astype(v.dtype), v,
                                 preferred_element_type=jnp.float32))

    got = np.asarray(encoder_mha(q * scale, k * scale, v, interpret=True))
    assert got.shape == want.shape
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 2e-2, rel    # bf16 weight rounding; same f32 softmax


def test_encoder_mha_block_aligned():
    """Exact-multiple sequence length (no pad column masking)."""
    from notsofar_tpu.ops.pallas_kernels import encoder_mha
    rng = np.random.RandomState(8)
    BH, S, dk = 2, 512, 32
    q, k, v = (jnp.asarray(rng.randn(BH, S, dk).astype(np.float32) * 0.2
                           ).astype(jnp.bfloat16) for _ in range(3))
    lg = jnp.einsum("btd,bsd->bts", q, k,
                    preferred_element_type=jnp.float32)
    w = jax.nn.softmax(lg.astype(jnp.float32), axis=-1)
    want = np.asarray(jnp.einsum("bts,bsd->btd", w.astype(v.dtype), v,
                                 preferred_element_type=jnp.float32))
    got = np.asarray(encoder_mha(q, k, v, interpret=True))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 2e-2, rel


def test_attn_step_matches_einsum_reference():
    """Fused single-token KV-cache self-attention == the einsum
    formulation (TextDecoder suffix-decode mask), incl. pad masking."""
    from notsofar_tpu.ops.pallas_kernels import attn_step
    rng = np.random.RandomState(3)
    B, ctx, H, dk = 3, 64, 4, 64
    D = H * dk
    pos = 37
    pads = np.asarray([0, 5, 12], np.int32)
    q = rng.randn(B, 1, D).astype(np.float32) * 0.3
    kc = rng.randn(B, ctx, D).astype(np.float32) * 0.3
    vc = rng.randn(B, ctx, D).astype(np.float32) * 0.3
    # zero rows past pos (never written in a real decode)
    kc[:, pos + 1:] = 0.0
    vc[:, pos + 1:] = 0.0
    scale = dk ** -0.5

    got = np.asarray(attn_step(
        jnp.asarray(q * scale), jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(pos, jnp.int32), jnp.asarray(pads), dk,
        interpret=True))                            # [B, 1, D]

    # reference: per-head einsum with the TextDecoder mask
    qh = q.reshape(B, 1, H, dk).transpose(0, 2, 1, 3)
    kh = kc.reshape(B, ctx, H, dk).transpose(0, 2, 1, 3)
    vh = vc.reshape(B, ctx, H, dk).transpose(0, 2, 1, 3)
    lg = np.einsum("bhtd,bhsd->bhts", qh * scale, kh)
    keys = np.arange(ctx)
    for b in range(B):
        vis = (keys <= pos) & ((keys >= pads[b]) | (keys == pos))
        lg[b, :, :, ~vis] = -1e30
    w = np.exp(lg - lg.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    want = np.einsum("bhts,bhsd->bhtd", w, vh).transpose(0, 2, 1, 3) \
        .reshape(B, 1, D)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_attn_step_single_group_dk128():
    """dk=128 -> one head per 128-lane group (g=1 path)."""
    from notsofar_tpu.ops.pallas_kernels import attn_step
    rng = np.random.RandomState(4)
    B, ctx, H, dk = 2, 32, 2, 128
    D = H * dk
    pos = 10
    q = rng.randn(B, 1, D).astype(np.float32) * 0.3
    kc = rng.randn(B, ctx, D).astype(np.float32) * 0.3
    vc = rng.randn(B, ctx, D).astype(np.float32) * 0.3
    scale = dk ** -0.5
    got = np.asarray(attn_step(
        jnp.asarray(q * scale), jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(pos, jnp.int32), jnp.zeros(B, jnp.int32), dk,
        interpret=True))
    qh = q.reshape(B, 1, H, dk).transpose(0, 2, 1, 3)
    kh = kc.reshape(B, ctx, H, dk).transpose(0, 2, 1, 3)
    vh = vc.reshape(B, ctx, H, dk).transpose(0, 2, 1, 3)
    lg = np.einsum("bhtd,bhsd->bhts", qh * scale, kh)
    lg[..., np.arange(ctx) > pos] = -1e30
    w = np.exp(lg - lg.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    want = np.einsum("bhts,bhsd->bhtd", w, vh).transpose(0, 2, 1, 3) \
        .reshape(B, 1, D)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_attn_step_split_matches_reference():
    """Split-cache beam attention == einsum over the concatenated
    (prompt | own generated) keys with the pad/step masks."""
    from notsofar_tpu.ops.pallas_kernels import attn_step_split
    rng = np.random.RandomState(7)
    B, K, Pp, G, H, dk = 2, 3, 16, 32, 4, 64
    D = H * dk
    BK = B * K
    gslot = 9
    pads = np.asarray([0, 5], np.int32)
    q = rng.randn(BK, 1, D).astype(np.float32) * 0.3
    kp = rng.randn(B, Pp, D).astype(np.float32) * 0.3
    vp = rng.randn(B, Pp, D).astype(np.float32) * 0.3
    kg = rng.randn(BK, G, D).astype(np.float32) * 0.3
    vg = rng.randn(BK, G, D).astype(np.float32) * 0.3
    kg[:, gslot + 1:] = 0.0
    vg[:, gslot + 1:] = 0.0
    scale = dk ** -0.5

    got = np.asarray(attn_step_split(
        jnp.asarray(q * scale), jnp.asarray(kp), jnp.asarray(vp),
        jnp.asarray(kg), jnp.asarray(vg), jnp.asarray(gslot, jnp.int32),
        jnp.asarray(pads), dk, K, interpret=True))

    for b in range(B):
        for j in range(K):
            r = b * K + j
            keys = np.concatenate([kp[b], kg[r]], axis=0)  # [Pp+G, D]
            vals = np.concatenate([vp[b], vg[r]], axis=0)
            qh = q[r, 0].reshape(H, dk)
            kh = keys.reshape(-1, H, dk)
            lg = np.einsum("hd,shd->hs", qh * scale, kh)
            cols = np.arange(Pp + G)
            vis = np.where(cols < Pp, cols >= pads[b],
                           (cols - Pp) <= gslot)
            lg[:, ~vis] = -1e30
            w = np.exp(lg - lg.max(-1, keepdims=True))
            w = w / w.sum(-1, keepdims=True)
            want = np.einsum("hs,shd->hd", w,
                             vals.reshape(-1, H, dk)).reshape(D)
            np.testing.assert_allclose(got[r, 0], want, rtol=2e-4,
                                       atol=2e-4, err_msg=f"b{b} j{j}")


def test_attn_step_split_single_beam_matches_attn_step():
    """K=1 split attention == the contiguous-cache attn_step on the
    concatenated cache."""
    from notsofar_tpu.ops.pallas_kernels import attn_step, attn_step_split
    rng = np.random.RandomState(8)
    B, Pp, G, H, dk = 2, 8, 16, 2, 64
    D = H * dk
    gslot = 4
    q = rng.randn(B, 1, D).astype(np.float32) * 0.3
    kp = rng.randn(B, Pp, D).astype(np.float32) * 0.3
    vp = rng.randn(B, Pp, D).astype(np.float32) * 0.3
    kg = rng.randn(B, G, D).astype(np.float32) * 0.3
    vg = rng.randn(B, G, D).astype(np.float32) * 0.3
    kg[:, gslot + 1:] = 0.0
    vg[:, gslot + 1:] = 0.0
    pads = np.zeros(B, np.int32)
    got = np.asarray(attn_step_split(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp), jnp.asarray(kg),
        jnp.asarray(vg), jnp.asarray(gslot, jnp.int32), jnp.asarray(pads),
        dk, 1, interpret=True))
    kc = np.concatenate([kp, kg], axis=1)
    vc = np.concatenate([vp, vg], axis=1)
    want = np.asarray(attn_step(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(Pp + gslot, jnp.int32), jnp.asarray(pads), dk,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_attn_step_split_ancestry_matches_physical_reorder():
    """anc-masked attention over UNREORDERED caches == beam-identity
    attention over caches physically gathered along the ancestry (the
    reorder-free beam scheme's correctness contract)."""
    from notsofar_tpu.ops.pallas_kernels import attn_step_split
    rng = np.random.RandomState(11)
    B, K, Pp, G, H, dk = 2, 3, 8, 16, 2, 64
    D = H * dk
    BK = B * K
    gslot = 5
    pads = np.zeros(B, np.int32)
    q = rng.randn(BK, 1, D).astype(np.float32) * 0.3
    kp = rng.randn(B, Pp, D).astype(np.float32) * 0.3
    vp = rng.randn(B, Pp, D).astype(np.float32) * 0.3
    kg = rng.randn(BK, G, D).astype(np.float32) * 0.3
    vg = rng.randn(BK, G, D).astype(np.float32) * 0.3
    kg[:, gslot + 1:] = 0.0
    vg[:, gslot + 1:] = 0.0
    # random but self-consistent ancestry: slot gslot is own row (the
    # step's token is written in place), earlier slots arbitrary
    anc = rng.randint(0, K, (B, K, G)).astype(np.int32)
    anc[:, :, gslot] = np.arange(K)[None, :]

    got = np.asarray(attn_step_split(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp), jnp.asarray(kg),
        jnp.asarray(vg), jnp.asarray(gslot, jnp.int32), jnp.asarray(pads),
        dk, K, anc=jnp.asarray(anc), interpret=True))

    # physical equivalent: gather each logical beam's history per slot
    kg_phys = np.zeros_like(kg)
    vg_phys = np.zeros_like(vg)
    for b in range(B):
        for j in range(K):
            for s in range(gslot + 1):
                kg_phys[b * K + j, s] = kg[b * K + anc[b, j, s], s]
                vg_phys[b * K + j, s] = vg[b * K + anc[b, j, s], s]
    want = np.asarray(attn_step_split(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
        jnp.asarray(kg_phys), jnp.asarray(vg_phys),
        jnp.asarray(gslot, jnp.int32), jnp.asarray(pads), dk, K,
        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
