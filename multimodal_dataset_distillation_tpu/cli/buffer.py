"""Expert-trajectory trainer entry point (reference ``buffer.py``).

Trains ``num_experts`` independent CLIP-style bi-encoders on the real
dataset, snapshotting image-tower + text-projection parameters after every
epoch, and saves each expert's trajectory pair as
``{img,txt}_replay_buffer_{n}`` under
``{buffer_path}/{dataset}/{image_encoder}/{text_encoder}``
(``buffer.py:27-31,104-112``).

TPU-native: the per-batch train step is one jitted program (batch sharded
over the mesh ``data`` axis); the frozen BERT runs once up front into the
caption-embedding cache instead of every batch.  Experts are fully
independent — on multi-host deployments fan them out one-expert-per-host
(SURVEY.md §2.6 "expert parallel").
"""

from __future__ import annotations

import os
import sys
from typing import Dict, List, Optional, Sequence

import numpy as np

from multimodal_dataset_distillation_tpu.config import Config, parse_config
from multimodal_dataset_distillation_tpu.data import get_dataset
from multimodal_dataset_distillation_tpu.data.textcache import (
    load_or_process_file,
    make_text_encoder,
    textprocess,
    textprocess_train,
)
from multimodal_dataset_distillation_tpu.engine.buffer_io import save_expert
from multimodal_dataset_distillation_tpu.engine.eval import epoch_test, itm_eval
from multimodal_dataset_distillation_tpu.engine.expert import (
    BiEncoderTrainer,
    init_bi_encoder,
)
from multimodal_dataset_distillation_tpu.models.clip_model import build_bi_encoder
from multimodal_dataset_distillation_tpu.utils.logging import RunLogger, get_time


def _n_devices() -> int:
    import jax

    return len(jax.devices())


def make_caption_lookup(train_dataset, cfg: Config, cache_dir: str = "."):
    """caption string -> cached CLS embedding (frozen tower => exact)."""
    sentences = train_dataset.get_all_captions()
    cache = load_or_process_file("train_text", textprocess_train, cfg,
                                 sentences, cache_dir=cache_dir)
    embed = cache["bert_test_embed"].astype(np.float32)
    index: Dict[str, int] = {}
    for i, s in enumerate(sentences):
        index.setdefault(s, i)

    def lookup(captions: Sequence[str]) -> np.ndarray:
        return embed[[index[c] for c in captions]]

    return lookup, embed, sentences


def main(cfg: Config) -> List[int]:
    from multimodal_dataset_distillation_tpu.parallel.mesh import (
        setup_compilation_cache,
    )
    from multimodal_dataset_distillation_tpu.ops import pallas_gconv
    from multimodal_dataset_distillation_tpu.ops import s2d

    setup_compilation_cache()
    # pallas grouped-conv kernel: single-device only (see pallas_gconv.configure)
    pallas_gconv.configure(cfg)
    s2d.configure(cfg)
    # the reference buffer.py has no --transfer flag (buffer.py:118-161);
    # teachers are plain CLIPModel_full(args) (buffer.py:46).  Our union
    # config accepts the flag everywhere — ignore it for teachers so the
    # written trajectories always match the distill students' flat width.
    cfg = cfg.replace(transfer=False)
    logger = RunLogger(name=cfg.name, config=vars(cfg) if hasattr(cfg, "__dict__") else None,
                       disable_wandb=cfg.disable_wandb, log_dir=cfg.save_dir)
    print("Hyper-parameters: \n", cfg)

    save_dir = os.path.join(cfg.buffer_path, cfg.dataset)
    if cfg.dataset in ("CIFAR10", "CIFAR100") and not cfg.zca:
        save_dir += "_NO_ZCA"
    save_dir = os.path.join(save_dir, cfg.image_encoder, cfg.text_encoder)
    os.makedirs(save_dir, exist_ok=True)

    trainloader, testloader, train_dataset, test_dataset = get_dataset(cfg)
    data = load_or_process_file("text", textprocess, cfg, testloader)
    bert_test_embed = data["bert_test_embed"].astype(np.float32)
    print(f"The shape of bert_test_embed: {bert_test_embed.shape}")
    caption_lookup, _, _ = make_caption_lookup(train_dataset, cfg)

    if cfg.text_trainable:
        saved = _run_text_trainable(cfg, save_dir, trainloader, testloader,
                                    bert_test_embed, logger)
        logger.finish()
        return saved

    # data-parallel mesh (DataParallel semantics, buffer.py:51-53) and
    # multi-host topology.  Two multi-host modes:
    #   * default: expert-per-host FAN-OUT — experts are independent
    #     (buffer.py:42), so each process trains its round-robin subset on
    #     its local devices (zero cross-host traffic; the ideal scaling
    #     for phase 1)
    #   * --distributed: cross-host DATA parallelism — one expert at a
    #     time, the global batch sharded over every process's devices
    #     (the working superset of the reference's dead DDP scaffolding,
    #     utils.py:847-869)
    from multimodal_dataset_distillation_tpu.parallel.mesh import (
        expert_assignment,
        get_mesh,
        maybe_init_distributed,
    )

    maybe_init_distributed()
    import jax

    nproc = jax.process_count()
    mesh = None
    expert_ids = list(range(cfg.num_experts))
    explicit_index = False
    save_rank0_only = False
    if nproc > 1 and cfg.distributed:
        from multimodal_dataset_distillation_tpu.data.pipeline import Loader

        mesh = get_mesh(cfg.mesh_shape, cfg.mesh_axes)
        per = max(1, trainloader.batch_size // nproc)
        trainloader = Loader(trainloader.dataset, per, shuffle=True,
                             drop_last=True, num_workers=cfg.num_workers,
                             seed=cfg.seed,
                             shard=(jax.process_index(), nproc))
        save_rank0_only = True
        print(f"[multi-host] DP: {nproc} processes, mesh {dict(mesh.shape)}, "
              f"per-host batch {per}")
    elif nproc > 1:
        expert_ids = list(expert_assignment(cfg.num_experts))
        mesh = get_mesh((), ("data",), devices=jax.local_devices())
        explicit_index = True
        print(f"[multi-host] expert fan-out: process {jax.process_index()} "
              f"trains experts {expert_ids} on {len(jax.local_devices())} "
              f"local device(s)")
    elif cfg.mesh_shape or _n_devices() > 1:
        mesh = get_mesh(cfg.mesh_shape, cfg.mesh_axes)
        print(f"Device mesh: {dict(mesh.shape)}")

    saved: List[int] = []
    if cfg.parallel_experts > 1:
        saved = _run_parallel(cfg, save_dir, trainloader, testloader,
                              caption_lookup, bert_test_embed, logger,
                              mesh=mesh)
        logger.finish()
        return saved

    trainer = None  # ONE trainer (and compiled step) reused per expert:
    # lr is a traced argument and reset() re-arms init/seed/opt-state, so
    # expert N+1 skips the full remote recompile expert N paid
    for it in expert_ids:
        model = build_bi_encoder(cfg)
        variables = init_bi_encoder(model, cfg.replace(seed=cfg.seed + it))
        if cfg.image_pretrained:
            # the reference's timm pretrained=... (networks.py:666);
            # offline: import from a local checkpoint when one exists
            from multimodal_dataset_distillation_tpu.models.import_torch import (
                maybe_load_pretrained_image_tower,
            )

            variables, ckpt = maybe_load_pretrained_image_tower(
                variables, cfg.image_encoder)
            if ckpt:
                print(f"Loaded pretrained image tower from {ckpt}")
        if trainer is None:
            trainer = BiEncoderTrainer(
                model, variables, lr_img=cfg.lr_teacher_img,
                lr_txt=cfg.lr_teacher_txt, momentum=cfg.mom,
                weight_decay=cfg.l2, seed=cfg.seed + it, mesh=mesh,
                compute_dtype=cfg.train_dtype,
                device_augment=cfg.device_augment)
        else:
            trainer.reset(variables, seed=cfg.seed + it,
                          lr_img=cfg.lr_teacher_img,
                          lr_txt=cfg.lr_teacher_txt)

        img_traj = [trainer.snapshot_image_params()]
        txt_traj = [trainer.snapshot_text_params()]
        lr_img, lr_txt = cfg.lr_teacher_img, cfg.lr_teacher_txt
        lr_schedule = [cfg.train_epochs // 2 + 1]

        for e in range(cfg.train_epochs):
            train_loss, train_acc = trainer.train_epoch_captions(
                trainloader, caption_lookup)
            i2t, t2i = epoch_test(testloader, model, trainer.variables,
                                  bert_test_embed, cfg.k_test)
            val = itm_eval(i2t, t2i, testloader.dataset.txt2img,
                           testloader.dataset.img2txt)
            logger.log({"train_loss": train_loss, "train_acc": train_acc,
                        **val})
            print(f"Itr: {it}\tEpoch: {e}\tTrain Acc: {train_acc:.4f}\t"
                  f"Img R@1: {val['img_r1']:.2f} R@5: {val['img_r5']:.2f} "
                  f"R@10: {val['img_r10']:.2f}\t"
                  f"Txt R@1: {val['txt_r1']:.2f} R@5: {val['txt_r5']:.2f} "
                  f"R@10: {val['txt_r10']:.2f}")
            img_traj.append(trainer.snapshot_image_params())
            txt_traj.append(trainer.snapshot_text_params())

            if e in lr_schedule and cfg.decay:
                lr_img *= 0.1
                lr_txt *= 0.1
                trainer.reset_optimizers(lr_img, lr_txt, cfg.mom, cfg.l2)

        if save_rank0_only and jax.process_index() != 0:
            continue  # DP mode: trajectories are replicated; rank 0 writes
        n = save_expert(save_dir, img_traj, txt_traj,
                        index=it if explicit_index else None)
        print(f"Saved expert {it} -> buffer index {n} in {save_dir}")
        saved.append(n)
    logger.finish()
    return saved


def _run_parallel(cfg: Config, save_dir, trainloader, testloader,
                  caption_lookup, bert_test_embed, logger,
                  mesh=None) -> List[int]:
    """Expert-parallel phase 1: vmap K experts into one XLA program
    (SURVEY.md §2.6 row EP — the reference trains them sequentially)."""
    from multimodal_dataset_distillation_tpu.data.pipeline import Loader
    from multimodal_dataset_distillation_tpu.engine.expert import (
        ParallelExpertTrainer,
    )
    from multimodal_dataset_distillation_tpu.parallel.mesh import get_mesh

    if mesh is None and cfg.mesh_shape:
        mesh = get_mesh(cfg.mesh_shape, cfg.mesh_axes)
    if cfg.decay:
        print("Warning: --decay LR schedule not applied in expert-parallel "
              "mode; run with --parallel_experts=1 for decayed experts")

    saved: List[int] = []
    it0 = 0
    while it0 < cfg.num_experts:
        k = min(cfg.parallel_experts, cfg.num_experts - it0)
        model = build_bi_encoder(cfg)
        var_list = [init_bi_encoder(model, cfg.replace(seed=cfg.seed + it0 + j))
                    for j in range(k)]
        if cfg.image_pretrained:
            # same pretrained import as the sequential path — without it,
            # --parallel_experts buffers would silently start from random
            # towers while --parallel_experts=1 buffers start pretrained
            from multimodal_dataset_distillation_tpu.models.import_torch import (
                maybe_load_pretrained_image_tower,
            )

            loaded = []
            for j in range(k):
                var_list[j], ckpt = maybe_load_pretrained_image_tower(
                    var_list[j], cfg.image_encoder)
                loaded.append(ckpt)
            if loaded[0]:
                print(f"Loaded pretrained image tower from {loaded[0]} "
                      f"(all {k} parallel experts)")
        trainer = ParallelExpertTrainer(
            model, var_list, lr_img=cfg.lr_teacher_img,
            lr_txt=cfg.lr_teacher_txt, momentum=cfg.mom, weight_decay=cfg.l2,
            # per-expert key chains matching sequential
            # BiEncoderTrainer(seed=cfg.seed + it) runs exactly
            seeds=[cfg.seed + it0 + j for j in range(k)], mesh=mesh)
        # one batch stream per expert (reference per-expert shuffling)
        loaders = [Loader(trainloader.dataset, trainloader.batch_size,
                          shuffle=True, drop_last=True,
                          num_workers=cfg.num_workers,
                          seed=cfg.seed + 7919 * (it0 + j))
                   for j in range(k)]

        img_trajs = [[trainer.snapshot_image_params(j)] for j in range(k)]
        txt_trajs = [[trainer.snapshot_text_params(j)] for j in range(k)]

        for e in range(cfg.train_epochs):
            losses, accs = trainer.train_epoch_captions(loaders,
                                                        caption_lookup)
            for j in range(k):
                i2t, t2i = epoch_test(testloader, model,
                                      trainer.variables_for(j),
                                      bert_test_embed, cfg.k_test)
                val = itm_eval(i2t, t2i, testloader.dataset.txt2img,
                               testloader.dataset.img2txt)
                logger.log({"train_loss": float(losses[j]),
                            "train_acc": float(accs[j]), **val})
                print(f"Itr: {it0 + j}\tEpoch: {e}\t"
                      f"Train Acc: {float(accs[j]):.4f}\t"
                      f"Img R@1: {val['img_r1']:.2f}\t"
                      f"Txt R@1: {val['txt_r1']:.2f}")
                img_trajs[j].append(trainer.snapshot_image_params(j))
                txt_trajs[j].append(trainer.snapshot_text_params(j))

        for j in range(k):
            n = save_expert(save_dir, img_trajs[j], txt_trajs[j])
            print(f"Saved expert {it0 + j} -> buffer index {n} in {save_dir}")
            saved.append(n)
        it0 += k
    return saved


if __name__ == "__main__":
    main(parse_config(defaults=Config(image_encoder="nfnet")))


def _run_text_trainable(cfg: Config, save_dir, trainloader, testloader,
                        bert_test_embed, logger) -> List[int]:
    """--text_trainable experts (buffer.py:49-50): the txt optimizer and
    per-epoch txt snapshots cover the full BERT tower; the projection
    stays frozen at init.  Retrieval eval still scores through the cached
    CLS embeddings + frozen projection, as the reference does."""
    import jax
    import jax.numpy as jnp

    from multimodal_dataset_distillation_tpu.engine.expert import (
        TrainableTextTrainer,
    )
    from multimodal_dataset_distillation_tpu.models.bert import TextEncoder
    from multimodal_dataset_distillation_tpu.models.clip_model import (
        VLBiEncoderTrainableText,
    )

    if cfg.text_encoder != "bert":
        raise NotImplementedError(
            "--text_trainable is a BERT-tower mode (networks.py:697)")

    from multimodal_dataset_distillation_tpu.models.zoo import (
        IMAGE_FEATURE_DIMS,
    )

    tok_owner = TextEncoder(variant=cfg.text_encoder_config,
                            pretrained=cfg.text_pretrained, seed=cfg.seed)
    # cfg.transfer is always False here: main() strips --transfer from
    # every teacher path (the reference has no such flag in buffer.py,
    # and a transfer head would change the written trajectory width)
    model = VLBiEncoderTrainableText(
        image_encoder_name=cfg.image_encoder,
        image_embedding=IMAGE_FEATURE_DIMS.get(cfg.image_encoder,
                                               cfg.image_embedding),
        bert_variant=cfg.text_encoder_config,
        transfer=False)

    saved: List[int] = []
    pad_to = 64
    trainer = None  # ONE trainer (and compiled step) reused per expert —
    # same hypers every expert, so reset() re-arms init/seed/opt-state
    # and expert N+1 skips the full recompile expert N paid
    for it in range(cfg.num_experts):
        rng = jax.random.PRNGKey(cfg.seed + it)
        imgs = jnp.zeros((2, cfg.image_size, cfg.image_size, 3), jnp.float32)
        ids = jnp.zeros((2, pad_to), jnp.int32)
        variables = model.init({"params": rng, "dropout": rng}, imgs, ids,
                               jnp.ones_like(ids))
        if cfg.text_pretrained and tok_owner.variables is not None:
            # seed the in-step BERT tower from the (possibly HF-imported)
            # frozen tower so both modes start from the same weights
            variables = dict(variables)
            p = dict(variables["params"])
            p["text_encoder"] = tok_owner.variables["params"]
            variables["params"] = p
        if trainer is None:
            trainer = TrainableTextTrainer(
                model, variables, lr_img=cfg.lr_teacher_img,
                lr_txt=cfg.lr_teacher_txt, momentum=cfg.mom,
                weight_decay=cfg.l2, seed=cfg.seed + it)
        else:
            trainer.reset(variables, seed=cfg.seed + it)

        img_traj = [trainer.snapshot_image_params()]
        txt_traj = [trainer.snapshot_text_params()]
        for e in range(cfg.train_epochs):
            train_loss, train_acc = trainer.train_epoch_captions(
                trainloader, tok_owner.tokenize, pad_to=pad_to)
            i2t, t2i = epoch_test(testloader, model, trainer.variables,
                                  bert_test_embed, cfg.k_test)
            val = itm_eval(i2t, t2i, testloader.dataset.txt2img,
                           testloader.dataset.img2txt)
            logger.log({"train_loss": train_loss, "train_acc": train_acc,
                        **val})
            print(f"Itr: {it}\tEpoch: {e}\tTrain Acc: {train_acc:.4f}\t"
                  f"Img R@1: {val['img_r1']:.2f}\tTxt R@1: {val['txt_r1']:.2f}"
                  f"\t(text_trainable)")
            img_traj.append(trainer.snapshot_image_params())
            txt_traj.append(trainer.snapshot_text_params())

        n = save_expert(save_dir, img_traj, txt_traj)
        print(f"Saved expert {it} -> buffer index {n} in {save_dir}")
        saved.append(n)
    return saved
