"""Fully-fused greedy decode kernel vs the modular fast path (interpret).

The fused kernel (ops/pallas/fused_decode.py) runs embedding + all
decoder layers + generator + DecodingManager sift in one launch per step
over time-major HBM caches. On CPU/f32 interpret mode its token stream
must EXACTLY match make_fast_greedy_fn + manager.sift (f32 reassociation
differences are ~1e-6, far below random-init logit gaps).
"""

import jax
import jax.numpy as jnp
import numpy as np

from p4fr_tpu.decoding import manager as dm
from p4fr_tpu.decoding.fast_step import make_fast_greedy_fn
from p4fr_tpu.decoding.fused_greedy import make_fused_greedy_fn

from helpers import synth_images, synth_labels, tiny_satrn

B, T = 4, 10


def _tokens(model, variables, images, tables, fused, **kw):
    if fused:
        fn = make_fused_greedy_fn(
            model, variables, max_steps=T, tables=tables,
            batch_tile=2, chunk=4, interpret=True, **kw
        )
    else:
        fn = make_fast_greedy_fn(
            model, variables, max_steps=T, tables=tables, **kw
        )
    return np.asarray(fn(images))


def test_fused_greedy_matches_fast_path(vocab):
    for parity in (True, False):
        model = tiny_satrn(parity=parity)
        images = jnp.asarray(synth_images(B))
        text = jnp.asarray(synth_labels(B, 8))
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            images, text, train=False,
        )
        for tables in (None, dm.RuleTables.build(vocab)):
            ref = _tokens(model, variables, images, tables, fused=False)
            got = _tokens(model, variables, images, tables, fused=True)
            np.testing.assert_array_equal(ref, got)


def test_fused_greedy_logits_match_teacher_forced(vocab):
    """Per-step logits from the fused kernel == fast_decode_step when both
    consume the same (fused-kernel-chosen) token stream."""
    from p4fr_tpu.decoding.fast_step import (
        build_fast_decoder, fast_decode_step, init_fast_cache,
        precompute_cross_kv,
    )
    from p4fr_tpu.ops.pallas.fused_decode import (
        build_fused_params, fused_greedy_step,
    )

    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    fast = build_fast_decoder(model, variables)
    src = model.apply(variables, images, method="encode")
    cross_t = precompute_cross_kv(fast, src)
    cross = jnp.stack(cross_t)
    vsize = int(fast.w_gen.shape[1])
    params = build_fused_params(
        fast, None, max_steps=T, vocab_size=vsize,
        sos_id=int(model.sos_id), eos_id=0,
    )
    chunk = 4
    L = ((T + chunk - 1) // chunk) * chunk
    caches = jnp.zeros((len(fast.layers), L, B, 2 * fast.w_gen.shape[0]),
                       fast.w_gen.dtype)
    c_fast = init_fast_cache(fast, B, L)
    mstate = jnp.zeros((B, 4), jnp.int32).at[:, 0].set(model.sos_id)
    mstate = mstate.at[:, 1].set(1)
    token = jnp.zeros((B,), jnp.int32)
    kw = dict(head_num=params.head_num, cache_outputs=params.cache_outputs,
              use_manager=False, sos_id=params.sos_id, eos_id=0,
              lbrace_id=0, rbrace_id=0, vocab_size=vsize,
              batch_tile=2, chunk=chunk, interpret=True)
    for t in range(6):
        l_ref, c_fast = fast_decode_step(
            fast, token, jnp.asarray(t), cross_t, c_fast)
        token_n, caches, mstate, l_got = fused_greedy_step(
            token, jnp.asarray(t), caches, cross, mstate,
            tuple(params[:20]), **kw)
        np.testing.assert_allclose(
            np.asarray(l_ref), np.asarray(l_got)[:, :vsize],
            rtol=1e-4, atol=1e-4,
        )
        # fused argmax (manager off) == plain argmax of the logits
        np.testing.assert_array_equal(
            np.asarray(token_n), np.asarray(l_ref).argmax(-1))
        token = token_n


def test_fused_early_stop_matches_fixed(vocab):
    """Fused while_loop early-stop decode == fused fixed-length up to <EOS>
    (and the stop_override hook truncates at the injected step)."""
    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, 8))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    tables = dm.RuleTables.build(vocab)
    kw = dict(max_steps=T, tables=tables, batch_tile=2, chunk=4,
              interpret=True)
    fixed = np.asarray(make_fused_greedy_fn(model, variables, **kw)(images))
    early = np.asarray(make_fused_greedy_fn(
        model, variables, early_stop_eos=vocab.eos_id, **kw)(images))
    stops = jnp.asarray([1, 3, T, 5], jnp.int32)
    forced = np.asarray(make_fused_greedy_fn(
        model, variables, early_stop_eos=vocab.eos_id,
        stop_override=stops, **kw)(images))

    def trunc(row):
        out = []
        for t in row:
            if t == vocab.eos_id:
                break
            out.append(int(t))
        return out

    for ra, rb in zip(fixed, early):
        assert trunc(ra) == trunc(rb)
    for i, (ra, rc) in enumerate(zip(fixed, forced)):
        stop = int(stops[i])
        assert trunc(rc) == trunc(ra)[: stop + 1]
        assert (rc[stop + 1:] == vocab.eos_id).all()
