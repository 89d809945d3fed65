#!/usr/bin/env python
"""--parallel_eval wall-time at NFNet scale (run on TPU; VERDICT r2 item 6).

Times the full synset-eval block — num_eval fresh NFNet-L0+projection
models trained on a 100-pair synthetic set for epoch_eval_train+1 epochs,
then retrieval-evaled — sequentially (the reference structure,
``distill.py:303-328``) vs as one vmapped program
(``evaluate_synset_parallel``).  RNG streams are parity-exact between
the two paths (tests/test_parallel_eval.py), so this is a pure wall-time
comparison of the SAME computation.

Env: PE_NUM_EVAL=5  PE_EPOCHS=1  PE_NTEST=40
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from multimodal_dataset_distillation_tpu.parallel.mesh import (
        setup_compilation_cache,
    )

    setup_compilation_cache()

    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.data.datasets import SyntheticVLEval
    from multimodal_dataset_distillation_tpu.data.pipeline import Loader
    from multimodal_dataset_distillation_tpu.data.transforms import (
        make_test_transform,
    )
    from multimodal_dataset_distillation_tpu.engine.eval import (
        evaluate_synset,
        evaluate_synset_parallel,
    )
    from multimodal_dataset_distillation_tpu.engine.expert import init_bi_encoder
    from multimodal_dataset_distillation_tpu.models.clip_model import build_bi_encoder

    num_eval = int(os.environ.get("PE_NUM_EVAL", 5))
    n_test = int(os.environ.get("PE_NTEST", 40))
    cfg = Config(image_encoder="nfnet", image_size=224,
                 text_encoder_config="tiny", batch_train=50,
                 epoch_eval_train=int(os.environ.get("PE_EPOCHS", 1)),
                 k_test=128, batch_size_test=20, lr_net=0.05, seed=0,
                 num_eval=num_eval)
    model = build_bi_encoder(cfg)
    var_list = [init_bi_encoder(model, cfg.replace(seed=cfg.seed + 1000 + j))
                for j in range(num_eval)]
    rng = np.random.RandomState(0)
    # text dims must follow the built model (the tiny offline text
    # config is 128-d, not BERT-base's 768)
    tdim = model.text_embedding
    images = rng.randn(100, 224, 224, 3).astype(np.float32)
    texts = rng.randn(100, tdim).astype(np.float32)
    ds = SyntheticVLEval(n_test, make_test_transform(224), image_size=224,
                         seed=1)
    testloader = Loader(ds, batch_size=cfg.batch_size_test, shuffle=False,
                        drop_last=False, num_workers=2)
    bert_test = rng.randn(len(ds.text), tdim).astype(np.float32)

    def run_seq():
        out = []
        for j in range(num_eval):
            _, acc, val = evaluate_synset(j, model, var_list[j], images,
                                          texts, testloader, cfg, bert_test)
            out.append(val)
        return out

    def run_par():
        _, out = evaluate_synset_parallel(num_eval, model, var_list, images,
                                          texts, testloader, cfg, bert_test)
        return out

    for name, fn in (("sequential", run_seq), ("parallel_vmap", run_par)):
        fn()  # compile
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(json.dumps({
            "path": name, "num_eval": num_eval,
            "eval_block_seconds": round(dt, 2),
            "r_mean_0": round(out[0]["r_mean"], 3),
        }), flush=True)


if __name__ == "__main__":
    main()
