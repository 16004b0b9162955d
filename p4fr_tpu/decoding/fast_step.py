"""Optimized transformer decode step: fused weights, packed KV cache.

The generic flax ``decode_step`` issues ~10 small matmuls per layer per
token; on TPU each kernel launch costs ~10-20us, which dominates the AR
decode loop (measured: scan unrolling does not help — it is op-count, not
scan overhead). This module extracts the decoder weights ONCE into a fused
layout and runs the step as pure jnp with

- one [H, 3H] matmul for the current token's q/k/v,
- one [H, 2H] matmul for the output-cache projections (reference parity
  semantics: layer outputs become future K/V — EfficientSATRN.py:546-548),
- a single packed [B, L, 2H] cache per layer (one dynamic_update_slice
  instead of two),
- cross-attention K/V packed per layer and projected once per sequence.

Numerically identical to ``TransformerDecoder.step`` (see
tests/test_fast_step.py); used by the greedy/beam/ensemble hot loops when
the model exposes a transformer decoder.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from p4fr_tpu.ops.attention import NEG_INF

# Above this many parameters, weights must flow into jit as ARGUMENTS:
# closure-captured weights inline into the HLO as literals (~10x IR
# bloat; Swin-B/384 overflows the remote compile service). Below it,
# closure constants dispatch ~4% faster per call.
CLOSURE_PARAM_LIMIT = 40_000_000


def resolve_kernel(kernel: str) -> str:
    """Normalize a --kernel choice: "auto" -> "pallas_v2" on TPU / "jnp"
    elsewhere; an explicit "pallas_v2" degrades to "jnp" off-TPU
    (compiled Pallas needs the hardware; the jnp fast path is the same
    numeric class). "jnp"/"generic"/"fused" pass through."""
    import jax

    if kernel == "auto":
        return "pallas_v2" if jax.default_backend() == "tpu" else "jnp"
    if kernel == "pallas_v2" and jax.default_backend() != "tpu":
        return "jnp"
    return kernel

from p4fr_tpu.ops.posenc import sinusoid_interleaved


class FastLayer(NamedTuple):
    w_qkv: jnp.ndarray  # [H, 3H]
    b_qkv: jnp.ndarray  # [3H]
    w_out: jnp.ndarray  # [H, H]
    b_out: jnp.ndarray
    ln1_scale: jnp.ndarray
    ln1_bias: jnp.ndarray
    w_q2: jnp.ndarray  # [H, H] cross query
    b_q2: jnp.ndarray
    w_out2: jnp.ndarray
    b_out2: jnp.ndarray
    ln2_scale: jnp.ndarray
    ln2_bias: jnp.ndarray
    w_ff0: jnp.ndarray  # [H, F]
    b_ff0: jnp.ndarray
    w_ff1: jnp.ndarray  # [F, H]
    b_ff1: jnp.ndarray
    ln3_scale: jnp.ndarray
    ln3_bias: jnp.ndarray
    w_ck: jnp.ndarray  # [C, H] cross key (src projection)
    b_ck: jnp.ndarray
    w_cv: jnp.ndarray
    b_cv: jnp.ndarray


class FastDecoder(NamedTuple):
    embed_scaled: jnp.ndarray  # [V+1, H] * sqrt(H)
    pos_encoding: jnp.ndarray  # [max_len, H]
    layers: Tuple[FastLayer, ...]
    w_gen: jnp.ndarray  # [H, V]
    b_gen: jnp.ndarray
    head_num: int
    cache_outputs: bool


def build_fast_decoder(model, variables) -> FastDecoder:
    """Extract + fuse the transformer-decoder weights from flax variables."""
    dec = variables["params"]["decoder"]
    dtype = model.dtype
    hidden = model.cache_spec()[2]
    head_num = model.cache_spec()[1]
    layer_num = model.cache_spec()[0]

    def j(x):
        return jnp.asarray(x, dtype)

    layers: List[FastLayer] = []
    for i in range(layer_num):
        lp = dec[f"layer{i}"]
        sa, ca = lp["self_attention"], lp["cross_attention"]
        ff = lp["feedforward"]
        layers.append(
            FastLayer(
                w_qkv=jnp.concatenate(
                    [j(sa["q_linear"]["kernel"]), j(sa["k_linear"]["kernel"]),
                     j(sa["v_linear"]["kernel"])], axis=1
                ),
                b_qkv=jnp.concatenate(
                    [j(sa["q_linear"]["bias"]), j(sa["k_linear"]["bias"]),
                     j(sa["v_linear"]["bias"])]
                ),
                w_out=j(sa["out_linear"]["kernel"]),
                b_out=j(sa["out_linear"]["bias"]),
                ln1_scale=j(lp["self_attention_norm"]["scale"]),
                ln1_bias=j(lp["self_attention_norm"]["bias"]),
                w_q2=j(ca["q_linear"]["kernel"]),
                b_q2=j(ca["q_linear"]["bias"]),
                w_out2=j(ca["out_linear"]["kernel"]),
                b_out2=j(ca["out_linear"]["bias"]),
                ln2_scale=j(lp["cross_attention_norm"]["scale"]),
                ln2_bias=j(lp["cross_attention_norm"]["bias"]),
                w_ff0=j(ff["linear0"]["kernel"]),
                b_ff0=j(ff["linear0"]["bias"]),
                w_ff1=j(ff["linear1"]["kernel"]),
                b_ff1=j(ff["linear1"]["bias"]),
                ln3_scale=j(lp["feedforward_norm"]["scale"]),
                ln3_bias=j(lp["feedforward_norm"]["bias"]),
                w_ck=j(ca["k_linear"]["kernel"]),
                b_ck=j(ca["k_linear"]["bias"]),
                w_cv=j(ca["v_linear"]["kernel"]),
                b_cv=j(ca["v_linear"]["bias"]),
            )
        )
    embed = j(dec["embedding"]["embedding"]) * jnp.asarray(
        np.sqrt(hidden), dtype
    )
    pe = jnp.asarray(sinusoid_interleaved(500, hidden), dtype)
    return FastDecoder(
        embed_scaled=embed,
        pos_encoding=pe,
        layers=tuple(layers),
        w_gen=j(dec["generator"]["kernel"]),
        b_gen=j(dec["generator"]["bias"]),
        head_num=head_num,
        cache_outputs=bool(getattr(model, "reference_parity", True)),
    )


def precompute_cross_kv(fast: FastDecoder, src: jnp.ndarray):
    """Per-layer packed cross K/V: [B, S, 2H] each layer."""
    return tuple(
        jnp.concatenate(
            [src @ layer.w_ck + layer.b_ck, src @ layer.w_cv + layer.b_cv],
            axis=-1,
        )
        for layer in fast.layers
    )


def quantize_rows(x: jnp.ndarray, eps: float = 1e-8):
    """Symmetric per-row int8: x [..., D] -> (int8 [..., D], scale [...]).

    round-half-even (jnp.round) — the jnp twin and the Pallas kernel
    share this exact function, so quantized parity tests are exact."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), eps) / 127.0
    i8 = jnp.clip(
        jnp.round(xf / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return i8, scale


def precompute_cross_kv_int8(fast: FastDecoder, src: jnp.ndarray):
    """Per-layer int8 cross K/V: ((i8 [B,S,2H], scale [B,2,S]), ...).

    OPT-IN serving mode (``kv_quant="int8"``): halves the per-step
    cross-K/V HBM re-read — the single largest decode stream (47% of
    traffic at flagship shapes, docs/PERFORMANCE.md r4 roofline). K and
    V are quantized separately per (batch, position) row; the kernel
    folds the k-scale into the scores and the v-scale into the
    probabilities, so the dequantized tensor never materializes."""
    out = []
    for layer in fast.layers:
        k = src @ layer.w_ck + layer.b_ck
        v = src @ layer.w_cv + layer.b_cv
        ki, sk = quantize_rows(k)
        vi, sv = quantize_rows(v)
        out.append((
            jnp.concatenate([ki, vi], axis=-1),
            jnp.stack([sk, sv], axis=1),  # [B, 2, S] f32
        ))
    return tuple(out)


def dequantize_cross_kv(cross_kv, dtype=None):
    """Inverse of ``precompute_cross_kv_int8`` (for the jnp fallback and
    parity tests). Passes non-quantized entries through unchanged."""
    out = []
    for ckv in cross_kv:
        if not isinstance(ckv, tuple):
            out.append(ckv)
            continue
        i8, scale = ckv
        h = i8.shape[-1] // 2
        k = i8[..., :h].astype(jnp.float32) * scale[:, 0, :, None]
        v = i8[..., h:].astype(jnp.float32) * scale[:, 1, :, None]
        kv = jnp.concatenate([k, v], axis=-1)
        out.append(kv.astype(dtype) if dtype is not None else kv)
    return tuple(out)


def init_fast_cache(
    fast: FastDecoder, batch: int, max_len: int, *, tiled_tile: int = 0,
    quant: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    hidden = fast.w_gen.shape[0]
    if tiled_tile:
        from p4fr_tpu.ops.pallas.decoder_layer_v2 import tiled_cache_shape

        shape = tiled_cache_shape(batch, max_len, hidden, tiled_tile)
    else:
        shape = (batch, max_len, 2 * hidden)
    if quant:
        # int8 self-cache (kv_quant="int8_cache"): per-layer
        # ([G, L, TB, 2H] int8, [G, L, 2*TB] f32 scale) pairs; tiled
        # layout only — the scale chunks ride the same
        # contiguous-leading-dim DMA as the cache chunks. The k/v scales
        # merge into ONE 128-aligned minor dim (k lanes [:TB], v [TB:]):
        # Mosaic DMA slices need minor % 128 == 0, so the production
        # tile tb=64 is required (decoder_layer_v2 enforces it too).
        if not tiled_tile:
            raise ValueError("quantized cache requires tiled_tile")
        # NOTE: compiled Mosaic additionally needs 2*tile % 128 == 0
        # (decoder_layer_step_v2 enforces it); smaller tiles are legal
        # in interpret-mode tests only.
        g, L, tb, _ = shape
        return tuple(
            (jnp.zeros(shape, jnp.int8),
             jnp.zeros((g, L, 2 * tb), jnp.float32))
            for _ in fast.layers
        )
    return tuple(
        jnp.zeros(shape, fast.w_gen.dtype) for _ in fast.layers
    )


def _ln(x, scale, bias):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias


def _heads(x, h):
    b = x.shape[0]
    return x.reshape(b, h, x.shape[-1] // h)


def jnp_layer_step(
    layer: FastLayer,
    x: jnp.ndarray,  # [B, H]
    pos: jnp.ndarray,  # scalar
    kv_cache: jnp.ndarray,  # [B, L, 2H]
    ckv: jnp.ndarray,  # [B, S, 2H]
    *,
    head_num: int,
    cache_outputs: bool,
):
    """One decoder LAYER's AR step in plain jnp -> (out, new cache).

    The single-layer numeric contract shared by fast_decode_step and
    the Pallas kernels (same packed cache + slot-DUS semantics); also
    the per-layer fallback when no Pallas tile config fits scoped VMEM.
    """
    h = head_num
    batch, hidden = x.shape
    temp = jnp.asarray(float(hidden) ** 0.5, x.dtype)
    max_len = kv_cache.shape[1]
    qkv = x @ layer.w_qkv + layer.b_qkv  # [B, 3H]
    q, k_cur, v_cur = jnp.split(qkv, 3, axis=-1)
    kv_all = jax.lax.dynamic_update_slice(
        kv_cache,
        jnp.concatenate([k_cur, v_cur], -1)[:, None, :],
        (0, pos, 0),
    )
    k_all = kv_all[..., :hidden].reshape(batch, max_len, h, hidden // h)
    v_all = kv_all[..., hidden:].reshape(batch, max_len, h, hidden // h)
    scores = jnp.einsum("bhd,blhd->bhl", _heads(q, h), k_all) / temp
    ban = (jnp.arange(max_len) > pos)[None, None, :]
    scores = jnp.where(ban, jnp.asarray(NEG_INF, scores.dtype), scores)
    probs = jax.nn.softmax(scores, axis=-1)
    att = jnp.einsum("bhl,blhd->bhd", probs, v_all).reshape(batch, hidden)
    att = att @ layer.w_out + layer.b_out
    out = _ln(att + x, layer.ln1_scale, layer.ln1_bias)

    # cross attention over packed per-layer src K/V
    q2 = _heads(out @ layer.w_q2 + layer.b_q2, h)
    ck = ckv[..., :hidden].reshape(batch, -1, h, hidden // h)
    cv = ckv[..., hidden:].reshape(batch, -1, h, hidden // h)
    s2 = jnp.einsum("bhd,blhd->bhl", q2, ck) / temp
    p2 = jax.nn.softmax(s2, axis=-1)
    att2 = jnp.einsum("bhl,blhd->bhd", p2, cv).reshape(batch, hidden)
    att2 = att2 @ layer.w_out2 + layer.b_out2
    out = _ln(att2 + out, layer.ln2_scale, layer.ln2_bias)

    ffo = jnp.maximum(out @ layer.w_ff0 + layer.b_ff0, 0)
    ffo = jnp.maximum(ffo @ layer.w_ff1 + layer.b_ff1, 0)
    out = _ln(ffo + out, layer.ln3_scale, layer.ln3_bias)

    if cache_outputs:
        # reference parity: the layer OUTPUT becomes future K/V
        w_kv = layer.w_qkv[:, hidden:]  # [H, 2H] (k|v)
        b_kv = layer.b_qkv[hidden:]
        kv_o = out @ w_kv + b_kv
        kv_all = jax.lax.dynamic_update_slice(
            kv_all, kv_o[:, None, :], (0, pos, 0)
        )
    return out, kv_all


def fast_decode_step(
    fast: FastDecoder,
    token: jnp.ndarray,  # [B]
    pos: jnp.ndarray,  # scalar
    cross_kv: Tuple[jnp.ndarray, ...],
    cache: Tuple[jnp.ndarray, ...],
):
    """One AR step -> (logits [B, V] float32, new cache)."""
    x = fast.embed_scaled[token] + fast.pos_encoding[pos][None, :]
    new_cache = []
    for layer, kv_cache, ckv in zip(fast.layers, cache, cross_kv):
        x, kv_all = jnp_layer_step(
            layer, x, pos, kv_cache, ckv,
            head_num=fast.head_num, cache_outputs=fast.cache_outputs,
        )
        new_cache.append(kv_all)
    logits = (x @ fast.w_gen + fast.b_gen).astype(jnp.float32)
    return logits, tuple(new_cache)


def layer_weight_tuple(layer: FastLayer):
    """FastLayer -> the weight tuple consumed by the Pallas layer kernel."""
    return (
        layer.w_qkv,
        layer.b_qkv,
        layer.w_out,
        layer.b_out,
        (layer.ln1_scale, layer.ln1_bias),
        layer.w_q2,
        layer.b_q2,
        layer.w_out2,
        layer.b_out2,
        (layer.ln2_scale, layer.ln2_bias),
        layer.w_ff0,
        layer.b_ff0,
        layer.w_ff1,
        layer.b_ff1,
        (layer.ln3_scale, layer.ln3_bias),
    )


def pallas_decode_step_v2(
    fast: FastDecoder,
    token: jnp.ndarray,
    pos: jnp.ndarray,
    cross_kv: Tuple[jnp.ndarray, ...],
    cache: Tuple[jnp.ndarray, ...],
    *,
    batch_tile: int = 32,
    chunk: int = 64,
    interpret: bool = False,
    vmem_limit_kib: int = 0,
):
    """One AR step via the flash-decode fused layer kernel
    (ops/pallas/decoder_layer_v2.py): HBM-resident cache, prefix-chunk
    DMA with online softmax, single-slot XLA scatter. Caches allocated
    with ``init_fast_cache(tiled_tile=...)`` (4-D) automatically use the
    tile-contiguous DMA layout.

    (batch_tile, chunk, src_hbm) are auto-shrunk per layer shape via
    ``pick_v2_config`` so wide decoders (SwinTRN hidden=512) fit the 16MB
    scoped-VMEM limit instead of failing to compile; the measured-fastest
    flagship config (tb=32/ck=64, VMEM src) is unchanged by the picker.
    Raises if nothing fits — callers should use the jnp step then."""
    from p4fr_tpu.ops.pallas.decoder_layer_v2 import (
        decoder_layer_step_v2,
        pick_v2_config,
    )

    x = fast.embed_scaled[token] + fast.pos_encoding[pos][None, :]
    hidden = x.shape[-1]
    new_cache = []
    for layer, kv_cache, ckv in zip(fast.layers, cache, cross_kv):
        quant = isinstance(ckv, tuple)  # (int8 [B,S,2H], scale [B,2,S])
        ckv_arr, src_scale = ckv if quant else (ckv, None)
        cquant = isinstance(kv_cache, tuple)  # (int8 cache, f32 scales)
        cache_arr = kv_cache[0] if cquant else kv_cache
        tiled = cache_arr.ndim == 4
        cfg = pick_v2_config(
            batch=x.shape[0], hidden=hidden, s_len=ckv_arr.shape[1],
            filter_dim=layer.w_ff0.shape[1],
            itemsize=jnp.dtype(x.dtype).itemsize if cquant
            else jnp.dtype(cache_arr.dtype).itemsize,
            batch_tile=cache_arr.shape[2] if tiled else batch_tile,
            chunk=chunk, max_len=cache_arr.shape[1], fixed_tile=tiled,
            src_quant=quant, cache_quant=cquant,
            vmem_limit_kib=vmem_limit_kib,
        )
        if cfg is None:
            if cquant:
                raise ValueError(
                    "no v2 kernel config fits scoped VMEM for the "
                    "quantized cache; use kv_quant='int8' (cross only)"
                )
            if tiled:
                raise ValueError(
                    "no v2 kernel config fits scoped VMEM for "
                    f"hidden={hidden} s_len={ckv_arr.shape[1]} at the "
                    "tiled cache's baked tile; allocate an untiled cache"
                )
            # degrade THIS layer to the (numerically identical-class)
            # jnp step rather than failing the whole decode
            x, kv_cache = jnp_layer_step(
                layer, x, pos, kv_cache,
                dequantize_cross_kv((ckv,), dtype=x.dtype)[0],
                head_num=fast.head_num,
                cache_outputs=fast.cache_outputs,
            )
            new_cache.append(kv_cache)
            continue
        tb, ck, src_hbm = cfg
        # P4FR_CHUNK_BUFS: EXPERIMENT knob — depth of the kernel's
        # prefix-chunk DMA ring (default 2 = double buffer). Depths > 2
        # add tb*ck*2H bytes of scoped VMEM per slot, so pair with
        # P4FR_SCOPED_VMEM_KIB when probing beyond the shipped limit.
        import os as _os

        chunk_bufs = int(_os.environ.get("P4FR_CHUNK_BUFS", "2"))
        x, kv_cache = decoder_layer_step_v2(
            x, pos, kv_cache, ckv_arr, layer_weight_tuple(layer),
            src_scale,
            head_num=fast.head_num, cache_outputs=fast.cache_outputs,
            batch_tile=tb, chunk=ck, interpret=interpret,
            tiled_cache=tiled, src_hbm=src_hbm, chunk_bufs=chunk_bufs,
        )
        new_cache.append(kv_cache)
    logits = (x @ fast.w_gen + fast.b_gen).astype(jnp.float32)
    return logits, tuple(new_cache)


def make_v3_step(
    fast: FastDecoder,
    *,
    batch_tile: int = 32,
    chunk: int = 64,
    interpret: bool = False,
):
    """Build the single-launch stacked-layer step (decoder_stack_v3).

    EXPERIMENTAL — measured SLOWER than the per-layer v2 production
    path (best 390 vs 370 us/step at B=256; docs/PERFORMANCE.md r3
    "v3 single launch" table). Kept as the tested record of the
    fewer-launches experiment; production decode should stay on
    pallas_decode_step_v2.

    Returns ``(step, stack_cross_kv, init_cache)``:
    - ``step(token, pos, cross_kv_stacked, cache_stacked)`` ->
      ``(logits, new_cache_stacked)``;
    - ``stack_cross_kv(tuple)`` -> [NL, B, S, 2H];
    - ``init_cache(batch, max_len)`` -> zeros [NL, B, L, 2H].

    The stacked weights are built HERE (once per trace, outside the
    decode scan) so the scan body carries no per-step restacking.
    """
    from p4fr_tpu.ops.pallas.decoder_stack_v3 import (
        decoder_stack_step_v3,
        stack_fast_layers,
    )

    stacked_w = stack_fast_layers(fast.layers)
    hidden = fast.w_gen.shape[0]

    def stack_cross_kv(cross_kv):
        return jnp.stack(cross_kv)

    def init_cache(batch, max_len):
        return jnp.zeros(
            (len(fast.layers), batch, max_len, 2 * hidden),
            fast.w_gen.dtype,
        )

    def step(token, pos, cross_kv_stacked, cache_stacked):
        x = fast.embed_scaled[token] + fast.pos_encoding[pos][None, :]
        out, new_cache = decoder_stack_step_v3(
            x, pos, cache_stacked, cross_kv_stacked, stacked_w,
            head_num=fast.head_num, cache_outputs=fast.cache_outputs,
            batch_tile=batch_tile, chunk=chunk, interpret=interpret,
        )
        logits = (out @ fast.w_gen + fast.b_gen).astype(jnp.float32)
        return logits, new_cache

    return step, stack_cross_kv, init_cache


def pallas_decode_step(
    fast: FastDecoder,
    token: jnp.ndarray,
    pos: jnp.ndarray,
    cross_kv: Tuple[jnp.ndarray, ...],
    cache: Tuple[jnp.ndarray, ...],
    *,
    batch_tile: int = 8,
    interpret: bool = False,
):
    """One AR step where each decoder layer is ONE fused Pallas kernel
    (ops/pallas/decoder_layer.py). Same packed cache layout and numerics
    as ``fast_decode_step``."""
    from p4fr_tpu.ops.pallas.decoder_layer import decoder_layer_step

    x = fast.embed_scaled[token] + fast.pos_encoding[pos][None, :]
    new_cache = []
    for layer, kv_cache, ckv in zip(fast.layers, cache, cross_kv):
        x, kv_cache = decoder_layer_step(
            x,
            pos,
            kv_cache,
            ckv,
            layer_weight_tuple(layer),
            head_num=fast.head_num,
            cache_outputs=fast.cache_outputs,
            batch_tile=batch_tile,
            interpret=interpret,
        )
        new_cache.append(kv_cache)
    logits = (x @ fast.w_gen + fast.b_gen).astype(jnp.float32)
    return logits, tuple(new_cache)


def make_fast_greedy_fn(
    model,
    variables,
    *,
    max_steps: int,
    tables=None,
    early_stop_eos: Optional[int] = None,
    use_pallas: bool = False,
    use_pallas_v2: bool = False,
    batch_tile: int = 8,
    stop_override: Optional[jnp.ndarray] = None,
    tiled_cache="auto",
    kv_quant: str = "none",
    vmem_limit_kib: int = 0,
):
    """Greedy decode over the fast step.

    The returned fn accepts ``fn(variables, images)`` (weights flow in as
    jit ARGUMENTS — weight fusion traces inside, so the compiled program
    carries no weight constants; closure-captured weights bloat the HLO
    ~10x and overflow the remote compile service for large backbones) or
    the legacy ``fn(images)`` (weights closed over — fine for tests/tiny
    models).

    ``stop_override`` ([B] int32, requires ``early_stop_eos``) is a
    BENCHMARKING hook; pass the string ``"arg"`` to take the stop vector
    as the fn's LAST positional argument at call time (one compiled
    program, many length distributions). Sequence i is marked done once
    ``t >= stop_override[i]``, which lets bench.py measure the early-stop
    while_loop on a synthetic realistic length distribution without a
    trained model (random weights rarely emit <EOS>). Production decode
    leaves it None — outputs are then exactly the fixed-length decode's.

    ``kv_quant``: OPT-IN numerics changes for serving (never default):
    "int8" quantizes the per-layer cross-K/V to int8 with per-(row,
    position) scales (precompute_cross_kv_int8) — halves the dominant
    decode HBM stream (47% of traffic, docs/PERFORMANCE.md r4
    roofline); "int8_cache" additionally stores the self-attention KV
    cache in int8 (+per-slot scales, tiled layout) — halves the
    second-largest stream too. The Pallas v2 path consumes the int8
    tensors directly; the jnp paths dequantize the cross-K/V once
    outside the loop (same quantization error, no bandwidth win — they
    exist so the numerics class is testable on CPU) and keep the
    self-cache in model dtype.

    ``tiled_cache``: "auto" (default) allocates the tile-contiguous
    [G, L, TB=64, 2H] KV cache whenever the batch fills 64-row tiles and
    the flagship (64, 32, src_hbm) kernel config fits scoped VMEM —
    measured 351 vs 365 us/step for the 3L flagship scan (r4 slot
    probe; the slot DUS then updates only untiled leading dims and each
    prefix-chunk DMA reads one contiguous region). True forces the
    legacy TB=32 tiled layout; False keeps the flat [B, L, 2H] cache.

    ``vmem_limit_kib``: the raised Mosaic scoped-VMEM limit the caller
    ships with its jit (``compiler_options`` from
    ``utils.xla_opts.tpu_compiler_options``); unlocks the
    auto-pipelined-src flagship kernel config (r4 sweep: +0.5% e2e).
    Pass ``xla_opts.scoped_vmem_kib(opts)`` so the config choice and
    the compile options stay coupled; 0 (default) keeps the 16MB-safe
    configs.
    """
    from p4fr_tpu.decoding import manager as dm

    if use_pallas_v2 and model.cache_spec()[2] % 128 != 0:
        # Mosaic lane layouts want the hidden dim in full 128-lane tiles;
        # smaller/odd widths fail with "unsupported shape cast". The jnp
        # fast path is the same numeric class, so degrade silently (tiny
        # test/debug models are the only ones affected — production
        # decoders are 256/512 wide).
        use_pallas_v2 = False

    sos_id = model.sos_id
    if stop_override is not None and early_stop_eos is None:
        raise ValueError(
            "stop_override requires early_stop_eos (it gates the "
            "early-exit while_loop; without it the fixed-length scan "
            "would silently ignore the injected stop steps)"
        )
    # stop_override="arg": take the per-sequence stop steps as a RUNTIME
    # argument (last positional) instead of a baked closure constant, so
    # one compiled program serves many batches with different length
    # distributions (sorted-batching benchmarks need this)
    stops_as_arg = isinstance(stop_override, str) and stop_override == "arg"
    if use_pallas_v2:
        def step_fn(fast_, token, t, cross_kv, cache):
            return pallas_decode_step_v2(
                fast_, token, t, cross_kv, cache,
                vmem_limit_kib=vmem_limit_kib,
            )
    elif use_pallas:
        def step_fn(fast_, token, t, cross_kv, cache):
            return pallas_decode_step(
                fast_, token, t, cross_kv, cache, batch_tile=batch_tile
            )
    else:
        step_fn = fast_decode_step

    if use_pallas_v2 and jax.default_backend() != "tpu":
        # compiled Pallas needs a TPU; fall back to the interpreter so an
        # explicit --kernel pallas_v2 still works (slowly) off-TPU
        def step_fn(fast_, token, t, cross_kv, cache):
            return pallas_decode_step_v2(
                fast_, token, t, cross_kv, cache, interpret=True
            )

    cache_len = max_steps
    if use_pallas_v2 and cache_len % 128 != 0:
        cache_len = ((cache_len + 127) // 128) * 128  # chunk alignment

    def fn(*args):
        stops = stop_override
        if stops_as_arg:
            *args, stops = args
        if len(args) == 2:
            vars_, images = args
        else:
            (images,) = args
            vars_ = variables
        fast = build_fast_decoder(model, vars_)
        src = model.apply(vars_, images, method="encode")
        b0 = src.shape[0]
        batch = b0
        if use_pallas_v2:
            # keep the kernel's batch tiles full: a prime/odd batch would
            # degrade the largest-divisor tile fallback to tb=1 (an
            # order-of-magnitude slowdown); pad post-encoder and slice
            # the tokens back instead
            # int8_cache pads to FULL 64-row tiles: its merged k|v scale
            # minor dim (2*TB) must be 128-aligned for the Mosaic chunk
            # DMA, so only tb=64 compiles
            mult = 64 if kv_quant == "int8_cache" else 16
            batch = ((b0 + mult - 1) // mult) * mult
            if batch != b0:
                src = jnp.pad(src, ((0, batch - b0), (0, 0), (0, 0)))
        if kv_quant in ("int8", "int8_cache"):
            cross_kv = precompute_cross_kv_int8(
                fast, src.astype(fast.w_gen.dtype)
            )
            if not use_pallas_v2:
                # reproduce the quantization numerics without the
                # bandwidth win (CPU tests / tiny models); the int8
                # self-cache exists only in the Pallas kernel, so
                # int8_cache degrades to cross-only there
                cross_kv = dequantize_cross_kv(
                    cross_kv, dtype=fast.w_gen.dtype
                )
        elif kv_quant != "none":
            raise ValueError(f"unknown kv_quant {kv_quant!r}")
        else:
            cross_kv = precompute_cross_kv(
                fast, src.astype(fast.w_gen.dtype)
            )
        tile = 0
        if use_pallas_v2:
            if tiled_cache == "auto":
                # tile-contiguous cache at the production tile: measured
                # 351 vs 365 us/step for the 3L flagship scan (the slot
                # DUS updates only untiled leading dims and the chunk
                # DMA reads one contiguous region). Engage exactly when
                # the flagship (64, 32, src_hbm) config fits, so wide
                # decoders keep the flat cache and the picker's
                # shrink-to-fit freedom.
                from p4fr_tpu.ops.pallas.decoder_layer_v2 import (
                    pick_v2_config,
                )

                cfg = batch % 64 == 0 and pick_v2_config(
                    batch=batch, hidden=fast.w_gen.shape[0],
                    s_len=src.shape[1],
                    filter_dim=fast.layers[0].w_ff0.shape[1],
                    itemsize=jnp.dtype(fast.w_gen.dtype).itemsize,
                    batch_tile=64, chunk=32, max_len=cache_len,
                    fixed_tile=True,
                    src_quant=kv_quant in ("int8", "int8_cache"),
                    cache_quant=kv_quant == "int8_cache",
                    vmem_limit_kib=vmem_limit_kib,
                )
                # any tb>=64 config takes the tile-contiguous cache at
                # that tile (the picker only yields tb>=64 for the
                # flagship special case or a P4FR_V2_FORCE experiment
                # override)
                if cfg and cfg[0] >= 64 and batch % cfg[0] == 0:
                    tile = cfg[0]
            elif tiled_cache:
                tile = 32
            if kv_quant == "int8_cache" and tile != 64:
                # the int8 self-cache exists only at the production
                # tb=64 tiled config (scale-DMA lane alignment); no
                # silent degrade — the caller asked for a specific
                # numerics/bandwidth trade
                raise ValueError(
                    "kv_quant='int8_cache' requires the flagship tiled "
                    "config (tb=64/ck=32/src_hbm) to fit; this "
                    "decoder/batch does not engage it — use "
                    "kv_quant='int8' (cross-K/V only) instead"
                )
        cache = init_fast_cache(
            fast, batch, cache_len, tiled_tile=tile,
            quant=kv_quant == "int8_cache" and use_pallas_v2,
        )
        token0 = jnp.full((batch,), sos_id, jnp.int32)

        if early_stop_eos is not None:
            out_buf = jnp.full((batch, max_steps), early_stop_eos, jnp.int32)
            mstate0 = dm.init_state(batch, tables) if tables is not None else None
            done0 = jnp.arange(batch) >= b0  # pad rows never gate exit

            def cond(carry):
                t, *_ = carry
                return (carry[0] < max_steps) & ~jnp.all(carry[4])

            def body(carry):
                t, token, cache, mstate, done, buf = carry
                logits, cache = step_fn(fast, token, t, cross_kv, cache)
                if tables is not None:
                    target, _, mstate = dm.sift(mstate, logits, tables)
                else:
                    target = jnp.argmax(logits, -1).astype(jnp.int32)
                buf = buf.at[:, t].set(jnp.where(done, early_stop_eos, target))
                done = done | (target == early_stop_eos)
                if stops is not None:
                    so = jnp.asarray(stops)
                    if so.shape[0] != batch:  # post-encoder batch padding
                        so = jnp.pad(so, (0, batch - so.shape[0]))
                    done = done | (t >= so)
                return t + 1, target, cache, mstate, done, buf

            carry = (jnp.asarray(0), token0, cache, mstate0, done0, out_buf)
            *_, out_buf = jax.lax.while_loop(cond, body, carry)
            return out_buf[:b0]

        if tables is not None:
            mstate0 = dm.init_state(batch, tables)

            def body(carry, t):
                token, cache, mstate = carry
                logits, cache = step_fn(fast, token, t, cross_kv, cache)
                target, _, mstate = dm.sift(mstate, logits, tables)
                return (target, cache, mstate), target

            carry0 = (token0, cache, mstate0)
        else:

            def body(carry, t):
                token, cache = carry
                logits, cache = step_fn(fast, token, t, cross_kv, cache)
                target = jnp.argmax(logits, -1).astype(jnp.int32)
                return (target, cache), target

            carry0 = (token0, cache)

        # P4FR_SCAN_UNROLL: EXPERIMENT knob probing whether the e2e
        # trace's first-layer kernel penalty (+43us vs identical L1/L2;
        # PERFORMANCE.md scoped-VMEM sweep section) is per-loop-boundary
        # cost — unroll=2 halves boundary crossings, so a per-boundary
        # penalty amortizes while a per-argmax-chain one does not
        import os as _os

        unroll = int(_os.environ.get("P4FR_SCAN_UNROLL", "1"))
        _, tokens = jax.lax.scan(
            body, carry0, jnp.arange(max_steps), unroll=unroll
        )
        return tokens.T[:b0]

    return fn
