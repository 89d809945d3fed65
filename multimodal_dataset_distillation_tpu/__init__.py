"""TPU-native vision-language dataset distillation framework.

A from-scratch JAX/Flax/pjit/Pallas re-design of the capabilities of
`kushal-bhargav/multimodal_dataset_distillation` (bi-trajectory matching
distillation for image-text retrieval, TMLR 2024, arXiv 2308.07545):

* **Expert phase** — train many independent CLIP-style bi-encoders
  (trainable image tower + frozen BERT + trainable text projection) with a
  symmetric InfoNCE loss, snapshotting the full parameter vector each epoch
  into "replay buffer" trajectory files (reference: ``buffer.py``).
* **Distillation phase** — learn a tiny synthetic dataset (raw pixels +
  768-d text embeddings + two learnable inner LRs) by unrolling
  ``syn_steps`` of inner SGD on the synthetic data and matching the
  resulting parameters against a later point of an expert trajectory
  (reference: ``distill.py`` / ``distill_original.py``).
* **Evaluation** — train a fresh model on only the synthetic set and
  measure image<->text retrieval R@1/5/10 (reference: ``epoch_original.py``).

Everything is designed TPU-first: pure-functional models (flat parameter
vectors are native via ``jax.flatten_util.ravel_pytree``), the unrolled
inner loop is a single ``lax.scan`` with rematerialisation, parallelism is
``jax.sharding`` over a device mesh, and hot host-free ops (contrastive
scoring, top-k retrieval, DiffAugment) run on-device.
"""

__version__ = "0.1.0"

from multimodal_dataset_distillation_tpu.config import Config  # noqa: F401
