"""Batched beam search: width-1 equals greedy; wider beams behave."""

import jax
import jax.numpy as jnp
import numpy as np

from p4fr_tpu.decoding.beam import make_beam_fn
from p4fr_tpu.decoding.greedy import make_greedy_fn

from helpers import synth_images, synth_labels, tiny_satrn

B, T = 2, 7


def _setup():
    model = tiny_satrn()
    images = jnp.asarray(synth_images(B))
    text = jnp.asarray(synth_labels(B, T + 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images,
        text,
        train=False,
    )
    return model, variables, images


def test_beam_width_1_equals_greedy():
    model, variables, images = _setup()
    greedy = jax.jit(
        make_greedy_fn(model, max_steps=T, return_outputs=False)
    )
    beam = jax.jit(
        make_beam_fn(model, max_steps=T, beam_width=1, eos_id=1)
    )
    g = np.asarray(greedy(variables, images))
    b = np.asarray(beam(variables, images))
    np.testing.assert_array_equal(g, b)


def test_beam_width_3_runs_and_scores_sane():
    model, variables, images = _setup()
    beam = jax.jit(
        make_beam_fn(model, max_steps=T, beam_width=3, eos_id=1)
    )
    out = np.asarray(beam(variables, images))
    assert out.shape == (B, T)
    assert (out >= 0).all() and (out < 245).all()
    # deterministic
    out2 = np.asarray(beam(variables, images))
    np.testing.assert_array_equal(out, out2)


def test_beam_early_stop_matches_full_scan():
    """early_stop=True (all-finished while_loop exit) must be
    token-identical to the full scan — both when <EOS> never appears
    (random weights: the loop burns all steps) and when every beam
    finishes immediately (EOS-biased generator: the loop exits after ~2
    steps and the preallocated PAD/identity tail must reproduce the
    frozen-beam continuation)."""
    model, variables, images = _setup()
    for W in (1, 3):
        full = jax.jit(make_beam_fn(model, max_steps=T, beam_width=W,
                                    eos_id=1))
        es = jax.jit(make_beam_fn(model, max_steps=T, beam_width=W,
                                  eos_id=1, early_stop=True))
        np.testing.assert_array_equal(
            np.asarray(full(variables, images)),
            np.asarray(es(variables, images)),
        )
        # EOS-biased: every sample emits <EOS> at step 0
        biased = jax.tree_util.tree_map(lambda x: x, variables)
        bias = biased["params"]["decoder"]["generator"]["bias"]
        biased["params"]["decoder"]["generator"]["bias"] = (
            bias.at[1].add(50.0)
        )
        got_full = np.asarray(full(biased, images))
        got_es = np.asarray(es(biased, images))
        np.testing.assert_array_equal(got_full, got_es)
        assert (got_es[:, 0] == 1).all()  # EOS first
        assert (got_es[:, 1:] == model.pad_id).all()  # frozen tail


def _tiny_aster():
    from p4fr_tpu.models.aster import ASTER

    model = ASTER(
        num_classes=245, pad_id=2, sos_id=0,
        src_dim=48, hidden_dim=48, embedding_dim=48, layer_num=2,
    )
    images = jnp.asarray(np.random.default_rng(3).normal(
        size=(B, 64, 256, 3)).astype(np.float32))
    text = jnp.zeros((B, T + 1), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    return model, variables, images


def test_aster_beam_width_1_equals_greedy():
    """BASELINE config #3: EfficientASTER greedy + beam. The unified
    contract routes the tuple-of-(h, c) cache through the parent-beam
    gather (reference per-model beam: networks/EfficientASTER.py:368-519)."""
    model, variables, images = _tiny_aster()
    greedy = jax.jit(
        make_greedy_fn(model, max_steps=T, return_outputs=False)
    )
    beam = jax.jit(
        make_beam_fn(model, max_steps=T, beam_width=1, eos_id=1)
    )
    g = np.asarray(greedy(variables, images))
    b = np.asarray(beam(variables, images))
    np.testing.assert_array_equal(g, b)


def test_aster_beam_width_3_freezes_finished():
    model, variables, images = _tiny_aster()
    beam = jax.jit(
        make_beam_fn(model, max_steps=T, beam_width=3, eos_id=1)
    )
    out = np.asarray(beam(variables, images))
    assert out.shape == (B, T)
    assert (out >= 0).all() and (out < 245).all()
    for row in out:
        if 1 in row.tolist():
            k = row.tolist().index(1)
            assert all(t == 2 for t in row[k + 1:]), row


def test_swin_beam_width_1_equals_greedy():
    """SwinTRN shares the transformer decoder; beam must work through the
    packed KV cache exactly as for SATRN."""
    from p4fr_tpu.models.swin import SwinTRN

    model = SwinTRN(
        num_classes=245, pad_id=2, sos_id=0,
        input_height=16, input_width=16,
        dec_src_dim=16, dec_hidden_dim=32, dec_filter_dim=64,
        dec_layer_num=1, dec_head_num=4,
        enc_embed_dim=8, enc_depths=(1, 2), enc_num_heads=(2, 4),
        enc_window=2,
    )
    images = jnp.asarray(np.random.default_rng(4).normal(
        size=(B, 16, 16, 3)).astype(np.float32))
    text = jnp.zeros((B, T + 1), jnp.int32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    greedy = jax.jit(
        make_greedy_fn(model, max_steps=T, return_outputs=False)
    )
    beam = jax.jit(
        make_beam_fn(model, max_steps=T, beam_width=1, eos_id=1)
    )
    g = np.asarray(greedy(variables, images))
    b = np.asarray(beam(variables, images))
    np.testing.assert_array_equal(g, b)
    wide = jax.jit(
        make_beam_fn(model, max_steps=T, beam_width=3, eos_id=1)
    )
    out = np.asarray(wide(variables, images))
    assert out.shape == (B, T)


def test_beam_pads_after_eos():
    """Once a hypothesis emits <EOS>, the continuation must be <PAD>."""
    model, variables, images = _setup()
    beam = jax.jit(
        make_beam_fn(model, max_steps=T, beam_width=2, eos_id=1)
    )
    out = np.asarray(beam(variables, images))
    for row in out:
        if 1 in row.tolist():
            k = row.tolist().index(1)
            assert all(t == 2 for t in row[k + 1 :]), row


def test_aster_beam_fast_lstm_matches_generic():
    """Beam over ASTER's fused-LSTM fast step (decoding/fast_aster.py) ==
    beam over the generic flax decode_step, token for token — the
    parent-beam gather must permute the (h, c) LSTM cache exactly like
    the transformer KV cache."""
    model, variables, images = _tiny_aster()
    for w in (1, 3):
        a = jax.jit(make_beam_fn(
            model, max_steps=T, beam_width=w, eos_id=1, kernel="generic"
        ))(variables, images)
        b = jax.jit(make_beam_fn(
            model, max_steps=T, beam_width=w, eos_id=1, kernel="jnp"
        ))(variables, images)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_beam_kernel_paths_agree():
    """Beam over the fused fast step ("jnp") == beam over the generic flax
    decode_step, token for token (SATRN; the per-step equivalence is
    proven in test_fast_step.py — this checks the cache-gather path)."""
    from helpers import synth_images, synth_labels, tiny_satrn

    model = tiny_satrn()
    images = jnp.asarray(synth_images(2))
    text = jnp.asarray(synth_labels(2, 6))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images, text, train=False,
    )
    for w in (1, 3):
        a = jax.jit(make_beam_fn(
            model, max_steps=T, beam_width=w, eos_id=1, kernel="generic"
        ))(variables, images)
        b = jax.jit(make_beam_fn(
            model, max_steps=T, beam_width=w, eos_id=1, kernel="jnp"
        ))(variables, images)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_beam_bounded_gather_matches_full(monkeypatch):
    """The prefix-bounded chunked cache reorder (beam.py gather_leaf,
    engaged when the cache slot dim is >= 2*SLOT_CHUNK) must be
    token-identical to the whole-cache jnp.take it replaces. max_steps
    =128 makes the jnp-path cache [BW, 128, 2H], which takes the
    chunked fori_loop at the default SLOT_CHUNK=64; patching SLOT_CHUNK
    above the cache length forces the legacy full gather."""
    from p4fr_tpu.decoding import beam as beam_mod

    model, variables, images = _setup()
    steps = 128
    assert beam_mod.SLOT_CHUNK == 64  # default engages the bounded path
    bounded = np.asarray(jax.jit(make_beam_fn(
        model, max_steps=steps, beam_width=3, eos_id=1, kernel="jnp"
    ))(variables, images))
    monkeypatch.setattr(beam_mod, "SLOT_CHUNK", 1024)
    full = np.asarray(jax.jit(make_beam_fn(
        model, max_steps=steps, beam_width=3, eos_id=1, kernel="jnp"
    ))(variables, images))
    np.testing.assert_array_equal(bounded, full)


def test_beam_stop_override_forces_finish():
    """stop_override="arg" (benchmark hook): stops past max_steps are a
    no-op (token-identical to plain early_stop); a stop at step s
    freezes every beam of that sample, so positions > s backtrace to
    <PAD> while position s keeps the model's real token."""
    model, variables, images = _setup()
    plain = jax.jit(make_beam_fn(
        model, max_steps=T, beam_width=3, eos_id=1, early_stop=True
    ))
    inj = jax.jit(make_beam_fn(
        model, max_steps=T, beam_width=3, eos_id=1, early_stop=True,
        stop_override="arg",
    ))
    big = jnp.full((B,), T + 5, jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(plain(variables, images)),
        np.asarray(inj(variables, images, big)),
    )
    stops = [2, 4]
    out = np.asarray(inj(variables, images, jnp.asarray(stops, jnp.int32)))
    for i, s in enumerate(stops):
        assert (out[i, s + 1:] == model.pad_id).all()
        assert out[i, s] != model.pad_id
