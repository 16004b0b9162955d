#!/usr/bin/env python
"""Library quickstart: build a model, decode images, print LaTeX.

Runs on CPU out of the box (random weights -> gibberish LaTeX, but shows
the full API surface). With a converted reference checkpoint, swap the
init for ``load_model_from_checkpoint``.

    python examples/quickstart.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from p4fr_tpu.data.vocab import Vocab, id_to_string
from p4fr_tpu.decoding.greedy import make_greedy_fn
from p4fr_tpu.decoding.manager import RuleTables
from p4fr_tpu.models.registry import get_network
from p4fr_tpu.utils.flags import Flags


def main():
    vocab = Vocab.from_files(["p4fr_tpu/configs/tokens.txt"])
    options = Flags("p4fr_tpu/configs/LiteSATRN.yaml").get()

    # shrink for a fast demo
    options.input_size.height, options.input_size.width = 64, 128
    model = get_network(options.network, options, vocab)

    # random weights; for real predictions load a converted checkpoint:
    #   from p4fr_tpu.infer.single import load_model_from_checkpoint
    #   model, variables, options, vocab, _ = load_model_from_checkpoint(p)
    images = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 64, 128, 3)),
        jnp.float32,
    )
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        images,
        jnp.zeros((2, 4), jnp.int32),
        train=False,
    )

    tables = RuleTables.build(vocab)  # grammar-constrained decoding
    decode = jax.jit(
        make_greedy_fn(model, max_steps=16, tables=tables,
                       return_outputs=False)
    )
    tokens = np.asarray(decode(variables, images))
    for latex in id_to_string(
        tokens, vocab.id_to_token, sos_id=vocab.sos_id, eos_id=vocab.eos_id,
        pad_id=vocab.pad_id, do_eval=True,
    ):
        print("pred:", latex)


if __name__ == "__main__":
    main()
