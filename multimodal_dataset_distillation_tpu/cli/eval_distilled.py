"""Evaluate a saved distilled dataset (``distilled_{it}.npz`` or a
``--save_pt`` ``images_{it}.pt``/``labels_{it}.pt`` pair).

New capability beyond the reference: upstream comments out its distilled
tensor saves (distill_original.py:292-296), so a finished reference run
can never be re-evaluated — only its wandb numbers survive.  Our distill
CLI persists ``image_syn``/``text_syn`` (+ the learned inner LRs, which
ARE the eval ``lr_net``: distill.py:312) at every eval; this CLI replays
the standard synset-evaluation protocol (epoch_original.py:164-195) on
any such file, with ``--num_eval`` fresh models and the same
sequential-or-vmapped paths as the in-run eval block.

Usage::

  python -m multimodal_dataset_distillation_tpu.cli.eval_distilled \\
      --distilled_npz=logged_files/flickr/<run>/distilled_1000.npz \\
      --dataset=flickr --image_encoder=nfnet --text_encoder=bert \\
      --num_eval=5 --epoch_eval_train=4 --std True
"""

from typing import List

import numpy as np

from multimodal_dataset_distillation_tpu.config import Config
from multimodal_dataset_distillation_tpu.data import get_dataset
from multimodal_dataset_distillation_tpu.data.textcache import (
    load_or_process_file,
    textprocess,
)
from multimodal_dataset_distillation_tpu.engine.eval import evaluate_synset
from multimodal_dataset_distillation_tpu.models.clip_model import (
    build_bi_encoder,
)


def main(cfg: Config) -> List[dict]:
    from multimodal_dataset_distillation_tpu.cli.distill import (
        make_eval_initializer,
    )
    from multimodal_dataset_distillation_tpu.parallel.mesh import (
        setup_compilation_cache,
    )

    setup_compilation_cache()
    if not cfg.distilled_npz:
        raise SystemExit("--distilled_npz=<path to distilled_{it}.npz or "
                         "images_{it}.pt> is required")
    if cfg.distilled_npz.endswith(".pt"):
        # --save_pt round trip: images_{it}.pt (NCHW) + sibling
        # labels_{it}.pt.  No learned-LR sidecar in the reference's
        # format — pass --lr_net (or rely on the default).
        import os

        import torch

        payload = {}
        imgs = torch.load(cfg.distilled_npz, map_location="cpu",
                          weights_only=True)
        image_syn = np.asarray(imgs, np.float32).transpose(0, 2, 3, 1)
        lbl = cfg.distilled_npz.replace("images_", "labels_")
        if lbl == cfg.distilled_npz or not os.path.exists(lbl):
            raise SystemExit(f"Sibling labels file not found: {lbl}")
        text_syn = np.asarray(
            torch.load(lbl, map_location="cpu", weights_only=True),
            np.float32)
    else:
        payload = np.load(cfg.distilled_npz)
        image_syn = payload["image_syn"].astype(np.float32)
        text_syn = payload["text_syn"].astype(np.float32)
    from multimodal_dataset_distillation_tpu.config import explicit_flags

    # precedence: explicit --lr_net > npz-embedded learned LR > default
    # (an LR sweep over a saved set must not be silently pinned to the
    # embedded value)
    lr_net = cfg.lr_net
    if "lr_net" in explicit_flags():
        print(f"Using the explicit --lr_net={lr_net} (overrides the "
              "npz-embedded learned LR)")
    elif "syn_lr_img" in payload:
        lr_net = float(payload["syn_lr_img"])
        print(f"Using the learned inner LR from the npz: lr_net={lr_net:.6f}")
    else:
        print("No embedded learned LR (pre-round-3 npz or .pt pair); "
              f"lr_net={lr_net}")
    print(f"Distilled set: {image_syn.shape[0]} pairs, "
          f"images {image_syn.shape}, texts {text_syn.shape}")

    _, testloader, _, _ = get_dataset(cfg)
    data = load_or_process_file("text", textprocess, cfg, testloader)
    bert_test_embed = data["bert_test_embed"].astype(np.float32)

    eval_cfg = cfg.replace(distill=True, lr_net=lr_net)
    eval_model = build_bi_encoder(eval_cfg)
    _eval_init = make_eval_initializer(cfg)

    results: List[dict] = []
    if cfg.parallel_eval and cfg.num_eval > 1:
        from multimodal_dataset_distillation_tpu.engine.eval import (
            evaluate_synset_parallel,
        )

        var_list = [_eval_init(eval_model, eval_cfg, cfg.seed + 1000 + j)
                    for j in range(cfg.num_eval)]
        _, results = evaluate_synset_parallel(
            cfg.num_eval, eval_model, var_list, image_syn, text_syn,
            testloader, eval_cfg, bert_test_embed)
        for j, val in enumerate(results):
            print(f"Evaluate_{j:02d}: "
                  + " ".join(f"{k}={v:.4f}" for k, v in val.items()))
    else:
        for j in range(cfg.num_eval):
            eval_vars = _eval_init(eval_model, eval_cfg, cfg.seed + 1000 + j)
            _, _, val = evaluate_synset(j, eval_model, eval_vars, image_syn,
                                        text_syn, testloader, eval_cfg,
                                        bert_test_embed)
            results.append(val)
            print(f"Evaluate_{j:02d}: "
                  + " ".join(f"{k}={v:.4f}" for k, v in val.items()))

    if cfg.std and results:
        for k in results[0]:
            vals = [r[k] for r in results]
            print(f"Mean/{k} = {np.mean(vals):.4f}  "
                  f"Std/{k} = {np.std(vals):.4f}")
    return results


if __name__ == "__main__":
    from multimodal_dataset_distillation_tpu.config import parse_config

    main(parse_config())
