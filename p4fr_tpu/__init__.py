"""p4fr_tpu — TPU-native math-formula recognition framework.

A ground-up JAX/XLA/Pallas/pjit rebuild of the capabilities of the
competition-winning math-formula recognizer
``bcaitech1/p4-fr-sorry-math-but-love-you`` (images of printed/handwritten
math expressions -> LaTeX token sequences).

Subsystems
----------
- ``models``    four encoder-decoder families (EfficientSATRN, LiteSATRN,
                EfficientASTER, SwinTRN) as flax modules with a unified
                encode / decode_train / decode_step contract.
- ``decoding``  lax.scan greedy + batched beam search over a preallocated
                on-device KV cache; vectorized grammar-constrained
                DecodingManager (reference: postprocessing/postprocessing.py).
- ``train``     single-optimizer, dual-optimizer and knowledge-distillation
                regimes on optax (reference: train_modules/).
- ``infer``     single-model and multi-model ensemble inference
                (reference: inference_modules/).
- ``parallel``  jax.sharding Mesh helpers; data/tensor-parallel pjit steps.
- ``ops``       shared numeric ops incl. Pallas TPU kernels.
- ``data``      host-side datasets + on-device augmentation.
- ``utils``     vocab, metrics (native C++ editdistance), flags, checkpoints.
"""

__version__ = "0.1.0"
