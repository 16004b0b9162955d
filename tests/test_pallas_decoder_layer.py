"""Fused Pallas decoder-layer kernels vs the jnp fast step (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from p4fr_tpu.decoding.fast_step import (
    build_fast_decoder,
    fast_decode_step,
    init_fast_cache,
    pallas_decode_step,
    pallas_decode_step_v2,
    precompute_cross_kv,
)

from helpers import synth_images, synth_labels, tiny_satrn

B, T = 4, 6


def test_pallas_layer_step_matches_fast_step():
    for parity in (True, False):
        model = tiny_satrn(parity=parity)
        images = jnp.asarray(synth_images(B))
        text = jnp.asarray(synth_labels(B, 8))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            images, text, train=False,
        )
        src = model.apply(variables, images, method="encode")
        fast = build_fast_decoder(model, variables)
        cross = precompute_cross_kv(fast, src)
        c1 = init_fast_cache(fast, B, T)
        c2 = init_fast_cache(fast, B, T)
        token = jnp.zeros((B,), jnp.int32)
        for t in range(4):
            l1, c1 = fast_decode_step(fast, token, jnp.asarray(t), cross, c1)
            l2, c2 = pallas_decode_step(
                fast, token, jnp.asarray(t), cross, c2,
                batch_tile=2, interpret=True,
            )
            np.testing.assert_allclose(
                np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5
            )
            for a, b in zip(c1, c2):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
                )
            token = jnp.argmax(l1, -1).astype(jnp.int32)


def test_pallas_v2_flash_decode_matches_fast_step():
    """v2: HBM cache + prefix-chunk DMA + online softmax + XLA slot DUS."""
    for parity in (True, False):
        model = tiny_satrn(parity=parity)
        images = jnp.asarray(synth_images(B))
        text = jnp.asarray(synth_labels(B, 8))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            images, text, train=False,
        )
        src = model.apply(variables, images, method="encode")
        fast = build_fast_decoder(model, variables)
        cross = precompute_cross_kv(fast, src)
        c1 = init_fast_cache(fast, B, 8)
        c2 = init_fast_cache(fast, B, 8)
        token = jnp.zeros((B,), jnp.int32)
        for t in range(6):
            l1, c1 = fast_decode_step(fast, token, jnp.asarray(t), cross, c1)
            l2, c2 = pallas_decode_step_v2(
                fast, token, jnp.asarray(t), cross, c2,
                batch_tile=2, chunk=4, interpret=True,
            )
            np.testing.assert_allclose(
                np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5
            )
            for a, b in zip(c1, c2):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
                )
            token = jnp.argmax(l1, -1).astype(jnp.int32)


def test_pallas_v2_src_hbm_matches_fast_step():
    """src_hbm=True: cross-attention K/V stays in HBM and is manually
    DMA'd into a single scratch buffer — numerics must be unchanged."""
    from p4fr_tpu.decoding.fast_step import layer_weight_tuple
    from p4fr_tpu.ops.pallas.decoder_layer_v2 import decoder_layer_step_v2

    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    src = model.apply(variables, images, method="encode")
    fast = build_fast_decoder(model, variables)
    cross = precompute_cross_kv(fast, src)
    c1 = init_fast_cache(fast, B, 8)
    c2 = init_fast_cache(fast, B, 8)
    token = jnp.zeros((B,), jnp.int32)
    layer = fast.layers[0]
    x = fast.embed_scaled[token] + fast.pos_encoding[0][None, :]
    for t in range(3):
        pos = jnp.asarray(t)
        o1, n1 = decoder_layer_step_v2(
            x, pos, c1[0], cross[0], layer_weight_tuple(layer),
            head_num=fast.head_num, cache_outputs=fast.cache_outputs,
            batch_tile=2, chunk=4, interpret=True, src_hbm=False,
        )
        o2, n2 = decoder_layer_step_v2(
            x, pos, c2[0], cross[0], layer_weight_tuple(layer),
            head_num=fast.head_num, cache_outputs=fast.cache_outputs,
            batch_tile=2, chunk=4, interpret=True, src_hbm=True,
        )
        np.testing.assert_allclose(
            np.asarray(o1), np.asarray(o2), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(n1), np.asarray(n2), rtol=1e-6, atol=1e-6
        )
        c1 = (n1,) + c1[1:]
        c2 = (n2,) + c2[1:]
        x = o1


def test_v2_step_degrades_to_jnp_when_nothing_fits():
    """A src too large for any scoped-VMEM config must NOT fail the
    decode: pallas_decode_step_v2 falls back to the per-layer jnp step
    (same numeric class) for untiled caches."""
    from p4fr_tpu.ops.pallas.decoder_layer_v2 import pick_v2_config

    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    src = model.apply(variables, images, method="encode")
    fast = build_fast_decoder(model, variables)
    cross = precompute_cross_kv(fast, src)
    # inflate the src K/V length until no (tile, chunk) fits
    reps = 1
    hidden = int(fast.w_gen.shape[0])
    while pick_v2_config(
        batch=B, hidden=hidden, s_len=cross[0].shape[1] * reps,
        filter_dim=int(fast.layers[0].w_ff0.shape[1]), itemsize=4,
        max_len=8, batch_tile=2, chunk=4,
    ) is not None:
        reps *= 2
        assert reps < 2 ** 16
    big_cross = tuple(jnp.tile(c, (1, reps, 1)) for c in cross)
    c1 = init_fast_cache(fast, B, 8)
    c2 = init_fast_cache(fast, B, 8)
    token = jnp.zeros((B,), jnp.int32)
    l1, c1 = fast_decode_step(fast, token, jnp.asarray(1), big_cross, c1)
    l2, c2 = pallas_decode_step_v2(
        fast, token, jnp.asarray(1), big_cross, c2,
        batch_tile=2, chunk=4, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5
    )


def test_pallas_v3_stacked_step_matches_fast_step():
    """v3: ONE launch per step, grid (tiles, layers), x carried in VMEM
    scratch, single stacked-cache DUS — numerics must equal the jnp
    fast step."""
    from p4fr_tpu.decoding.fast_step import make_v3_step

    for parity in (True, False):
        model = tiny_satrn(parity=parity)
        images = jnp.asarray(synth_images(B))
        text = jnp.asarray(synth_labels(B, 8))
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            images, text, train=False,
        )
        src = model.apply(variables, images, method="encode")
        fast = build_fast_decoder(model, variables)
        cross = precompute_cross_kv(fast, src)
        c1 = init_fast_cache(fast, B, 8)
        step3, stack_ckv, init_c3 = make_v3_step(
            fast, batch_tile=2, chunk=4, interpret=True
        )
        ckv3 = stack_ckv(cross)
        c3 = init_c3(B, 8)
        token = jnp.zeros((B,), jnp.int32)
        for t in range(6):
            l1, c1 = fast_decode_step(fast, token, jnp.asarray(t), cross, c1)
            l3, c3 = step3(token, jnp.asarray(t), ckv3, c3)
            np.testing.assert_allclose(
                np.asarray(l1), np.asarray(l3), rtol=1e-5, atol=1e-5
            )
            for i, a in enumerate(c1):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(c3[i]), rtol=1e-5, atol=1e-5
                )
            token = jnp.argmax(l1, -1).astype(jnp.int32)


def test_pick_v2_config():
    """VMEM auto-config: flagship dims keep the measured-fastest default;
    wide (SwinTRN) dims degrade to a fitting (tile, chunk, src_hbm)."""
    from p4fr_tpu.ops.pallas.decoder_layer_v2 import (
        _VMEM_BUDGET,
        pick_v2_config,
        scoped_vmem_estimate,
    )

    # flagship EfficientSATRN decode: hidden=256, src 8x16=128, bf16.
    # Full-64-row batches take tb=64/ck=32/src_hbm — the fastest config
    # that FITS the full greedy program (the auto-pipelined-src variant
    # is 19us faster kernels-only but the compiler reports 20.12M > 16M
    # scoped VMEM inside the e2e while loop)
    assert pick_v2_config(
        batch=256, hidden=256, s_len=128, filter_dim=1024,
        itemsize=2, max_len=256,
    ) == (64, 32, True)
    # batches that can't fill 64-row tiles keep the tb=32/ck=64 default
    assert pick_v2_config(
        batch=32, hidden=256, s_len=128, filter_dim=1024,
        itemsize=2, max_len=256,
    ) == (32, 64, False)
    # SwinTRN decoder (hidden=512) overflowed scoped VMEM at tb=32/ck=64
    # (compiler reported 28.6M > 16M): must pick a smaller config
    cfg = pick_v2_config(
        batch=32, hidden=512, s_len=144, filter_dim=512,
        itemsize=2, max_len=256,
    )
    assert cfg is not None and cfg != (32, 64, False)
    tb, ck, src_hbm = cfg
    assert scoped_vmem_estimate(
        batch_tile=tb, chunk=ck, hidden=512, s_len=144, filter_dim=512,
        itemsize=2, src_hbm=src_hbm,
    ) <= _VMEM_BUDGET
    # fixed_tile pins tb (tiled-cache allocations cannot shrink it)
    fixed = pick_v2_config(
        batch=32, hidden=512, s_len=144, filter_dim=512,
        itemsize=2, max_len=256, fixed_tile=True, batch_tile=16,
    )
    assert fixed is not None and fixed[0] == 16
    # chunk candidates respect max_len divisibility (tiny test models)
    assert pick_v2_config(
        batch=4, hidden=64, s_len=16, filter_dim=128,
        itemsize=4, max_len=8, batch_tile=2, chunk=4,
    ) == (2, 4, False)


def test_pick_v2_config_raised_vmem_limit():
    """A raised scoped-VMEM limit (shipped via jit compiler_options)
    upgrades the flagship case to the auto-pipelined src — the r4 sweep
    winner (1808 vs 1799 img/s e2e) — and ONLY that case: quantized
    paths and estimator-overflowing shapes keep their configs."""
    from p4fr_tpu.ops.pallas.decoder_layer_v2 import pick_v2_config

    flagship = dict(batch=256, hidden=256, s_len=128, filter_dim=1024,
                    itemsize=2, max_len=256)
    assert pick_v2_config(**flagship, vmem_limit_kib=24576) \
        == (64, 32, False)
    # without the raised limit: unchanged production src_hbm config
    assert pick_v2_config(**flagship) == (64, 32, True)
    # int8 cross-KV takes the upgrade too (measured 1896 vs 1852);
    # the full-quant cache path measured WORSE pipelined (1871 vs
    # 1887) and keeps its src_hbm config
    assert pick_v2_config(**flagship, vmem_limit_kib=24576,
                          src_quant=True) == (64, 32, False)
    assert pick_v2_config(**flagship, vmem_limit_kib=24576,
                          cache_quant=True) == (64, 32, True)
    # wide decoder (SwinTRN): pipelined-src estimate overflows even the
    # raised limit -> falls through to the shrink-to-fit path
    wide = pick_v2_config(batch=256, hidden=512, s_len=144,
                          filter_dim=512, itemsize=2, max_len=256,
                          vmem_limit_kib=24576)
    assert wide is not None and wide != (64, 32, False)
    # the tiled-cache auto probe (fixed_tile at the baked tb=64) must
    # agree with the step's pick so cache layout and kernel config match
    assert pick_v2_config(**flagship, vmem_limit_kib=24576,
                          fixed_tile=True, batch_tile=64, chunk=32) \
        == (64, 32, False)


def test_decode_compiler_options_env_and_backend_gating(monkeypatch):
    """xla_opts: CPU backend -> None (jit default path); env var
    overrides the production default; '0' disables entirely."""
    from p4fr_tpu.utils import xla_opts

    # conftest forces the CPU backend, so the TPU-only option must be
    # withheld no matter what the env says
    monkeypatch.delenv("P4FR_SCOPED_VMEM_KIB", raising=False)
    assert xla_opts.decode_compiler_options() is None
    assert xla_opts.tpu_compiler_options(default_kib=24576) is None
    monkeypatch.setenv("P4FR_SCOPED_VMEM_KIB", "32768")
    assert xla_opts.tpu_compiler_options() is None
    # the kib helper reads whatever dict the jit will actually carry
    assert xla_opts.scoped_vmem_kib(None) is None
    assert xla_opts.scoped_vmem_kib(
        {"xla_tpu_scoped_vmem_limit_kib": 24576}) == 24576


def test_tiled_cache_tile_fallback_respects_sublane16():
    """The tiled-cache tile FALLBACK must never bake a tile that is not a
    multiple of the bf16 sublane tile 16 (e.g. b=48 with the default
    tile 32 used to give tb=24, which the tiled kernel's
    (CK,TB,H)->(CK*TB,H) reshape cannot compile); impossible batches
    raise with a padding hint instead of a doomed allocation. Explicit
    exactly-dividing tiles (tiny interpret tests) stay honored."""
    import pytest

    from p4fr_tpu.ops.pallas.decoder_layer_v2 import (
        _pick_batch_tile,
        tiled_cache_shape,
    )

    # the advisor's case: 48 with the default 32 -> 16, not 24
    assert tiled_cache_shape(48, 8, 4, 32)[:3] == (3, 8, 16)
    assert _pick_batch_tile(48, 32, sublane16=True) == 16
    # multiples of the tile are honored directly
    assert _pick_batch_tile(64, 32, sublane16=True) == 32
    # explicit exactly-dividing small tiles stay honored (interpret mode)
    assert _pick_batch_tile(4, 2, sublane16=True) == 2
    # non-multiple-of-16 batch with no valid fallback raises clearly
    with pytest.raises(ValueError, match="multiple of 16"):
        _pick_batch_tile(40, 32, sublane16=True)
    # the untiled path keeps the permissive largest-divisor fallback
    assert _pick_batch_tile(48, 32, sublane16=False) == 24


def test_pallas_v2_tiled_cache_matches_fast_step():
    """tiled_cache=True: the [G, L, TB, 2H] tile-contiguous layout must
    reproduce the jnp fast step exactly (the DMA geometry changes, the
    math must not)."""
    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    src = model.apply(variables, images, method="encode")
    fast = build_fast_decoder(model, variables)
    cross = precompute_cross_kv(fast, src)
    c1 = init_fast_cache(fast, B, 8)
    c2 = init_fast_cache(fast, B, 8, tiled_tile=2)
    assert all(c.shape == (B // 2, 8, 2, c1[0].shape[-1]) for c in c2)
    token = jnp.zeros((B,), jnp.int32)
    for t in range(6):
        l1, c1 = fast_decode_step(fast, token, jnp.asarray(t), cross, c1)
        l2, c2 = pallas_decode_step_v2(
            fast, token, jnp.asarray(t), cross, c2,
            batch_tile=2, chunk=4, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5
        )
        # cache contents equal up to the layout permutation
        for a, b in zip(c1, c2):
            g, L, tb, twoh = b.shape
            b_flat = np.asarray(b).transpose(0, 2, 1, 3).reshape(
                g * tb, L, twoh
            )
            np.testing.assert_allclose(
                np.asarray(a), b_flat, rtol=1e-5, atol=1e-5
            )
        token = jnp.argmax(l1, -1).astype(jnp.int32)


def test_pallas_v2_slot_in_kernel_matches_external_dus():
    """slot_in_kernel=True: the cache row at ``pos`` is DMA'd into the
    aliased cache output inside the kernel (kills the external
    dynamic_update_slice the r4 device trace attributed at
    ~16.5us/layer/step). Numerics and cache contents must be unchanged
    across flat / tiled / src_hbm variants."""
    from p4fr_tpu.decoding.fast_step import layer_weight_tuple
    from p4fr_tpu.ops.pallas.decoder_layer_v2 import decoder_layer_step_v2

    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    src = model.apply(variables, images, method="encode")
    fast = build_fast_decoder(model, variables)
    cross = precompute_cross_kv(fast, src)
    token = jnp.zeros((B,), jnp.int32)
    layer = fast.layers[0]

    # flat cache cannot take the in-kernel row DMA (documented Mosaic
    # rejection) — the API refuses it eagerly
    with pytest.raises(ValueError, match="tiled_cache"):
        decoder_layer_step_v2(
            jnp.zeros((B, fast.w_gen.shape[0])), jnp.asarray(0),
            init_fast_cache(fast, B, 8)[0], cross[0],
            layer_weight_tuple(layer), head_num=fast.head_num,
            cache_outputs=fast.cache_outputs, batch_tile=2, chunk=4,
            interpret=True, slot_in_kernel=True,
        )

    for variant in (
        {"tiled_cache": True},
        {"tiled_cache": True, "src_hbm": True},
    ):
        c0 = init_fast_cache(fast, B, 8, tiled_tile=2)[0]
        c1 = c2 = c0
        x = fast.embed_scaled[token] + fast.pos_encoding[0][None, :]
        for t in range(3):
            pos = jnp.asarray(t)
            o1, n1 = decoder_layer_step_v2(
                x, pos, c1, cross[0], layer_weight_tuple(layer),
                head_num=fast.head_num, cache_outputs=fast.cache_outputs,
                batch_tile=2, chunk=4, interpret=True,
                slot_in_kernel=False, **variant,
            )
            o2, n2 = decoder_layer_step_v2(
                x, pos, c2, cross[0], layer_weight_tuple(layer),
                head_num=fast.head_num, cache_outputs=fast.cache_outputs,
                batch_tile=2, chunk=4, interpret=True,
                slot_in_kernel=True, **variant,
            )
            np.testing.assert_allclose(
                np.asarray(o1), np.asarray(o2), rtol=1e-6, atol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(n1), np.asarray(n2), rtol=1e-6, atol=1e-6
            )
            c1, c2, x = n1, n2, o1


def test_pallas_v2_int8_src_quant_matches_dequantized_jnp():
    """kv_quant="int8" cross-K/V: the kernel consumes the int8 tensors
    with per-(row, position) scales folded into scores/probabilities —
    it must match the jnp fast step fed the EXPLICITLY dequantized
    cross-K/V (exact same quantization error, different evaluation
    order), across the VMEM-src and HBM-src variants and both cache
    layouts."""
    from p4fr_tpu.decoding.fast_step import (
        dequantize_cross_kv,
        precompute_cross_kv_int8,
    )

    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    src = model.apply(variables, images, method="encode")
    fast = build_fast_decoder(model, variables)
    cross_q = precompute_cross_kv_int8(fast, src)
    assert all(c.dtype == jnp.int8 for c, _ in cross_q)
    assert all(s.shape == (B, 2, src.shape[1]) for _, s in cross_q)
    cross_dq = dequantize_cross_kv(cross_q, dtype=src.dtype)

    for tiled in (False, True):
        c1 = init_fast_cache(fast, B, 8)
        c2 = init_fast_cache(fast, B, 8, tiled_tile=2 if tiled else 0)
        token = jnp.zeros((B,), jnp.int32)
        for t in range(5):
            l1, c1 = fast_decode_step(
                fast, token, jnp.asarray(t), cross_dq, c1
            )
            l2, c2 = pallas_decode_step_v2(
                fast, token, jnp.asarray(t), cross_q, c2,
                batch_tile=2, chunk=4, interpret=True,
            )
            np.testing.assert_allclose(
                np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-4
            )
            token = jnp.argmax(l1, -1).astype(jnp.int32)


def test_pallas_v2_int8_src_hbm_variant_matches_vmem_variant():
    """The src_hbm=True int8 path (manual DMA of both the int8 K/V tile
    and its scale tile) must equal the auto-pipelined VMEM variant."""
    from p4fr_tpu.decoding.fast_step import (
        layer_weight_tuple,
        precompute_cross_kv_int8,
    )
    from p4fr_tpu.ops.pallas.decoder_layer_v2 import decoder_layer_step_v2

    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    src = model.apply(variables, images, method="encode")
    fast = build_fast_decoder(model, variables)
    ckv, scale = precompute_cross_kv_int8(fast, src)[0]
    layer = fast.layers[0]
    token = jnp.zeros((B,), jnp.int32)
    c1 = init_fast_cache(fast, B, 8)[0]
    c2 = c1
    x = fast.embed_scaled[token] + fast.pos_encoding[0][None, :]
    for t in range(3):
        pos = jnp.asarray(t)
        o1, n1 = decoder_layer_step_v2(
            x, pos, c1, ckv, layer_weight_tuple(layer), scale,
            head_num=fast.head_num, cache_outputs=fast.cache_outputs,
            batch_tile=2, chunk=4, interpret=True, src_hbm=False,
        )
        o2, n2 = decoder_layer_step_v2(
            x, pos, c2, ckv, layer_weight_tuple(layer), scale,
            head_num=fast.head_num, cache_outputs=fast.cache_outputs,
            batch_tile=2, chunk=4, interpret=True, src_hbm=True,
        )
        np.testing.assert_allclose(
            np.asarray(o1), np.asarray(o2), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(n1), np.asarray(n2), rtol=1e-6, atol=1e-6
        )
        c1, c2, x = n1, n2, o1


def test_greedy_fn_kv_quant_int8_close_to_unquantized():
    """make_fast_greedy_fn(kv_quant="int8") must run end-to-end and
    produce tokens overwhelmingly equal to the unquantized decode (int8
    with per-row scales keeps ~2 decimal digits; on a tiny random model
    the argmax can flip on near-ties, so assert high agreement, and
    assert the jnp and pallas-interpret quant paths agree EXACTLY with
    each other — same numerics class)."""
    from p4fr_tpu.decoding.fast_step import make_fast_greedy_fn

    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    base = make_fast_greedy_fn(model, variables, max_steps=8)(images)
    q_jnp = make_fast_greedy_fn(
        model, variables, max_steps=8, kv_quant="int8"
    )(images)
    agree = float(np.mean(np.asarray(base) == np.asarray(q_jnp)))
    assert agree >= 0.75, agree


def _snap_cache_rows(cache_tuple, pos):
    """Quantize-dequantize the row at ``pos`` of each layer's flat cache
    — the jnp twin of what the int8 cache kernel stores (per-row, per
    K/V-half scales via the SAME quantize_rows the kernel mirrors)."""
    from p4fr_tpu.decoding.fast_step import quantize_rows

    out = []
    for kv_all in cache_tuple:
        row = kv_all[:, pos, :]
        h = row.shape[-1] // 2
        k8, sk = quantize_rows(row[:, :h])
        v8, sv = quantize_rows(row[:, h:])
        deq = jnp.concatenate(
            [k8.astype(jnp.float32) * sk[:, None],
             v8.astype(jnp.float32) * sv[:, None]], -1,
        ).astype(kv_all.dtype)
        out.append(kv_all.at[:, pos, :].set(deq))
    return tuple(out)


def test_pallas_v2_int8_cache_quant_matches_snapped_jnp():
    """kv_quant="int8_cache": the kernel stores the self-attention KV
    cache in int8 with per-(slot, row) scales and folds the dequant
    into scores/probabilities. Twin: the jnp fast step whose cache row
    is quantize-dequantized after every step (prefix rows quantized,
    current-step seed exact — the kernel's exact semantics). Logits
    must track within quantization-rounding tolerance."""
    from p4fr_tpu.decoding.fast_step import precompute_cross_kv_int8

    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    src = model.apply(variables, images, method="encode")
    fast = build_fast_decoder(model, variables)
    from p4fr_tpu.decoding.fast_step import dequantize_cross_kv

    cross_q = precompute_cross_kv_int8(fast, src)
    cross_dq = dequantize_cross_kv(cross_q, dtype=src.dtype)
    c1 = init_fast_cache(fast, B, 8)
    c2 = init_fast_cache(fast, B, 8, tiled_tile=2, quant=True)
    for i8, scl in c2:
        assert i8.dtype == jnp.int8 and i8.shape == (B // 2, 8, 2, i8.shape[-1])
        # merged k|v scale minor dim: k lanes [:tb], v lanes [tb:]
        assert scl.shape == (B // 2, 8, 4) and scl.dtype == jnp.float32
    token = jnp.zeros((B,), jnp.int32)
    for t in range(6):
        l1, c1 = fast_decode_step(fast, token, jnp.asarray(t), cross_dq, c1)
        c1 = _snap_cache_rows(c1, t)
        l2, c2 = pallas_decode_step_v2(
            fast, token, jnp.asarray(t), cross_q, c2,
            batch_tile=2, chunk=4, interpret=True,
        )
        # an off-by-one-ulp int8 rounding on a single cache row can move
        # a logit by ~scale (1/127 of the row max); tolerate that class
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), rtol=5e-3, atol=5e-3
        )
        token = jnp.argmax(l1, -1).astype(jnp.int32)

    # and the stored int8 cache dequantizes to the twin's snapped cache
    for flat, (i8, scl) in zip(c1, c2):
        g, L, tb, twoh = i8.shape
        h = twoh // 2
        scl = np.asarray(scl)
        deq_k = i8[..., :h].astype(np.float32) * scl[:, :, :tb, None]
        deq_v = i8[..., h:].astype(np.float32) * scl[:, :, tb:, None]
        deq = np.concatenate([deq_k, deq_v], -1).transpose(0, 2, 1, 3)
        deq = deq.reshape(g * tb, L, twoh)
        np.testing.assert_allclose(
            np.asarray(flat), deq, rtol=5e-3, atol=5e-3
        )


@pytest.mark.parametrize("depth", [3, 4])
def test_pallas_v2_chunk_buf_ring_matches_fast_step(depth, monkeypatch):
    """chunk_bufs > 2: the deeper prefix-chunk DMA ring (an
    issue-latency experiment — docs/PERFORMANCE.md r4 kv-quant section
    showed decode is DMA-issue-bound, not bandwidth-bound) must be
    numerically identical to the double buffer. chunk=2 over a
    16-slot cache so late steps put >= depth chunks in flight."""
    monkeypatch.setenv("P4FR_CHUNK_BUFS", str(depth))
    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    src = model.apply(variables, images, method="encode")
    fast = build_fast_decoder(model, variables)
    cross = precompute_cross_kv(fast, src)
    c1 = init_fast_cache(fast, B, 16)
    c2 = init_fast_cache(fast, B, 16)
    token = jnp.zeros((B,), jnp.int32)
    for t in range(12):
        l1, c1 = fast_decode_step(fast, token, jnp.asarray(t), cross, c1)
        l2, c2 = pallas_decode_step_v2(
            fast, token, jnp.asarray(t), cross, c2,
            batch_tile=2, chunk=2, interpret=True,
        )
        np.testing.assert_allclose(
            np.asarray(l1), np.asarray(l2), rtol=1e-5, atol=1e-5
        )
        for a, b in zip(c1, c2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
            )
        token = jnp.argmax(l1, -1).astype(jnp.int32)
