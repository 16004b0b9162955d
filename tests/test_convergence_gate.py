"""Default-suite convergence gate (fast).

tests/test_convergence.py proves the full trainer generalizes but takes
minutes (RUN_SLOW=1 opt-in). This gate runs in the default suite: a tiny
SATRN must MEMORIZE four distinct image->formula pairs with raw jitted
train steps (no loader/host-metric overhead), then reproduce them with
the autoregressive greedy decoder. Guards the optimizer, the
teacher-forced loss masking, and the TF<->AR cache parity — the failure
modes shape tests can't see.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from helpers import tiny_satrn

from p4fr_tpu.decoding.greedy import make_greedy_fn
from p4fr_tpu.train.steps import cross_entropy_ignore_pad

PAD, EOS, SOS = 2, 1, 0


def test_tiny_satrn_memorizes_and_decodes():
    model = tiny_satrn()
    # four distinct "glyph" images -> four distinct 3-token formulas
    B, H, W = 4, 32, 64
    images = np.zeros((B, H, W, 3), np.float32)
    for i in range(B):
        images[i, :, i * 16 : i * 16 + 12, :] = 1.0
    # <SOS> a b <EOS> <PAD>...
    bodies = [(5, 9), (7, 11), (13, 17), (19, 23)]
    T = 6
    text = np.full((B, T), PAD, np.int32)
    text[:, 0] = SOS
    for i, (a, b) in enumerate(bodies):
        text[i, 1], text[i, 2], text[i, 3] = a, b, EOS
    images_j, text_j = jnp.asarray(images), jnp.asarray(text)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images_j, text_j[:, :-1], train=False,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, batch_stats, opt_state, rng):
        def loss_fn(p):
            logits, updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images_j, text_j[:, :-1], train=True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            return (
                cross_entropy_ignore_pad(logits, text_j[:, 1:], PAD),
                updates["batch_stats"],
            )

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        upd, new_opt = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), new_stats, new_opt, loss

    rng = jax.random.PRNGKey(2)
    first_loss = None
    loss = None
    for i in range(250):
        rng, sub = jax.random.split(rng)
        params, batch_stats, opt_state, loss = step(
            params, batch_stats, opt_state, sub
        )
        if first_loss is None:
            first_loss = float(loss)
    final_loss = float(loss)
    assert final_loss < first_loss * 0.2, (first_loss, final_loss)

    # AR greedy must reproduce the memorized sequences (body + EOS)
    decode = jax.jit(
        make_greedy_fn(model, max_steps=T - 1, return_outputs=False)
    )
    tokens = np.asarray(
        decode({"params": params, "batch_stats": batch_stats}, images_j)
    )
    correct = 0
    for i in range(B):
        if tuple(tokens[i, :3]) == tuple(text[i, 1:4]):
            correct += 1
    assert correct >= int(0.9 * B + 0.5), (tokens[:, :4], text[:, 1:5])
