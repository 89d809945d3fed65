"""Multi-process worker for tests/test_multiprocess.py (not a test).

Run as: python mh_worker.py <pid> <nproc> <port>

Initializes a real 2-process JAX cluster (Gloo collectives on CPU), forms
the global mesh, feeds per-host batch shards through
``host_local_to_global``, trains a tiny bi-encoder for one epoch with
data-parallel steps spanning both processes, and prints checksums the
driver compares across processes and against a single-process reference.
"""

import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])

import jax

jax.config.update("jax_num_cpu_devices", 4)
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=nproc,
                           process_id=pid)

import numpy as np

from multimodal_dataset_distillation_tpu.config import Config
from multimodal_dataset_distillation_tpu.data.pipeline import Loader
from multimodal_dataset_distillation_tpu.engine.expert import (
    BiEncoderTrainer,
    init_bi_encoder,
)
from multimodal_dataset_distillation_tpu.models.clip_model import VLBiEncoder
from multimodal_dataset_distillation_tpu.parallel.mesh import (
    expert_assignment,
    get_mesh,
    host_local_to_global,
)

assert jax.process_count() == nproc, jax.process_count()
mesh = get_mesh((), ("data",))
assert mesh.devices.size == 4 * nproc
print("ASSIGN", pid, expert_assignment(5), flush=True)

rng = np.random.RandomState(0)
IMAGES = rng.randn(32, 16, 16, 3).astype(np.float32)
TEXTS = rng.randn(32, 768).astype(np.float32)


class DS:
    def __len__(self):
        return 32

    def __getitem__(self, i):
        return IMAGES[i], i


# host_local_to_global sanity: global sum equals the full-batch sum
g = host_local_to_global(mesh, IMAGES[pid * 16:(pid + 1) * 16])
print("GSUM", pid, f"{float(jax.jit(lambda x: x.sum())(g)):.6f}", flush=True)

loader = Loader(DS(), batch_size=8 // nproc, shuffle=True, drop_last=True,
                num_workers=1, seed=1, shard=(pid, nproc))
cfg = Config(image_encoder="convnet_tiny", image_size=16)
model = VLBiEncoder(image_encoder_name="convnet_tiny", text_embedding=768,
                    image_embedding=64)
variables = init_bi_encoder(model, cfg)
trainer = BiEncoderTrainer(model, variables, lr_img=0.05, lr_txt=0.05,
                           seed=0, mesh=mesh)
loss = acc = 0.0
for imgs, idxs in loader:
    loss, acc = trainer.train_batch(imgs, TEXTS[np.asarray(idxs)])
flat = np.concatenate([np.asarray(x).ravel()
                       for x in jax.tree_util.tree_leaves(
                           trainer.variables["params"])])
print("PARAMSUM", pid, f"{float(np.sum(flat)):.8f}",
      f"{float(np.sum(np.abs(flat))):.8f}", flush=True)
print("LOSS", pid, f"{float(loss):.8f}", flush=True)
