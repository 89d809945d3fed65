"""Bi-trajectory distillation entry point (reference ``distill.py`` /
``distill_original.py``).

Flow (distill_original.py:89-496 as spec; fork features folded in):
1. data + text-embedding caches
2. synthetic init: random real pairs (or noise, --pix_init/--txt_init)
3. three outer SGD(momentum 0.5) optimizers: images, texts, inner-LRs
4. discover + shuffle expert buffers (dummy-buffer bootstrap when none
   exist, distill.py:262-274)
5. outer loop: [eval every eval_it its -> evaluate_synset x num_eval with
   fresh models at lr_net = learned syn_lr_img, mean/std logging,
   visualization/artifact saving] then one jitted distill step
   (unrolled syn_steps inner SGD + meta-gradient + outer updates)
6. NaN bailout (distill.py:599)
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import numpy as np

from multimodal_dataset_distillation_tpu.config import Config, parse_config
from multimodal_dataset_distillation_tpu.cli.buffer import make_caption_lookup
from multimodal_dataset_distillation_tpu.data import get_dataset
from multimodal_dataset_distillation_tpu.data.textcache import (
    load_or_process_file,
    make_text_encoder,
    textprocess,
)
from multimodal_dataset_distillation_tpu.engine.buffer_io import (
    discover_buffers,
    flatten_snapshot,
)
from multimodal_dataset_distillation_tpu.engine.distill import (
    Distiller,
    ExpertCycler,
    dummy_trajectory,
    get_images_texts,
    noise_images,
    noise_texts,
)
from multimodal_dataset_distillation_tpu.engine.eval import evaluate_synset
from multimodal_dataset_distillation_tpu.engine.expert import init_bi_encoder
from multimodal_dataset_distillation_tpu.models.clip_model import build_bi_encoder
from multimodal_dataset_distillation_tpu.utils.flat import flatten_params
from multimodal_dataset_distillation_tpu.utils.logging import RunLogger, get_time
from multimodal_dataset_distillation_tpu.utils.visualize import save_visualizations


def _bootstrap_dummy_buffers(cfg: Config, expert_dir: str) -> None:
    """Fabricate a 1-expert trajectory from a fresh init (distill.py:262-274)
    so distillation can run end-to-end without phase 1."""
    from multimodal_dataset_distillation_tpu.engine.buffer_io import save_expert

    print(f"No buffers at {expert_dir}; fabricating dummy buffers")
    model = build_bi_encoder(cfg)
    variables = init_bi_encoder(model, cfg)
    img = variables["params"]["image_encoder"]
    txt = variables["params"]["text_projection"]
    copies = max(cfg.expert_epochs + 1, 2)
    save_expert(expert_dir, dummy_trajectory(img, copies),
                dummy_trajectory(txt, copies), write_pt=False)


def _student_cfg(cfg: Config) -> Config:
    """Config for the distill student nets: distill-mode towers, never the
    transfer head — in the reference only the eval model gets
    ``eval_stage=args.transfer`` (distill.py:307); students are plain
    ``CLIPModel_full(args)`` (distill.py:440)."""
    return cfg.replace(distill=True, transfer=False)


def make_eval_initializer(cfg: Config):
    """Eval students start from pretrained towers exactly like the
    reference's CLIPModel_full(args) eval nets (networks.py:666 via
    epoch_original.py:164): offline import from a local timm checkpoint
    when one exists, random init otherwise.  Returns an
    ``init(eval_model, eval_cfg, seed) -> variables`` closure (shared by
    the distill eval block and the eval_distilled CLI)."""
    _eval_sd = None
    if cfg.image_pretrained:
        # shared locate/load/unwrap + arch gate with the teacher path
        # (maybe_load_pretrained_image_tower): eval students and teachers
        # must start from the same weights for the same run
        from multimodal_dataset_distillation_tpu.models.import_torch import (
            load_timm_state_dict,
        )

        _eval_sd, _ckpt = load_timm_state_dict(cfg.image_encoder)
        if _eval_sd is not None:
            print(f"Eval students use pretrained image tower: {_ckpt}")

    def _eval_init(eval_model, eval_cfg, seed):
        v = init_bi_encoder(eval_model, eval_cfg.replace(seed=seed))
        if _eval_sd is not None:
            from multimodal_dataset_distillation_tpu.models.import_torch import (
                load_image_tower_weights,
            )

            v = load_image_tower_weights(v, _eval_sd,
                                         arch=cfg.image_encoder)
        return v

    return _eval_init


def main(cfg: Config):
    from multimodal_dataset_distillation_tpu.parallel.mesh import (
        setup_compilation_cache,
    )
    from multimodal_dataset_distillation_tpu.ops import pallas_gconv
    from multimodal_dataset_distillation_tpu.ops import s2d

    setup_compilation_cache()
    # pallas grouped-conv kernel: single-device only (GSPMD cannot
    # partition the pallas call over a >1-device mesh)
    pallas_gconv.configure(cfg)
    s2d.configure(cfg)
    # reference flag-combination guards (distill_original.py:104-108)
    if cfg.zca and cfg.texture:
        raise AssertionError("Cannot use zca and texture together")
    if cfg.texture and cfg.pix_init == "real":
        print("WARNING: Using texture with real initialization will take a "
              "very long time to smooth out the boundaries between images.")

    logger = RunLogger(name=cfg.name, disable_wandb=cfg.disable_wandb,
                       log_dir=cfg.save_dir)
    print("Hyper-parameters: \n", cfg)

    trainloader, testloader, train_dataset, test_dataset = get_dataset(cfg)
    train_sentences = train_dataset.get_all_captions()
    data = load_or_process_file("text", textprocess, cfg, testloader)
    bert_test_embed = data["bert_test_embed"].astype(np.float32)
    caption_lookup, train_caption_embed, _ = make_caption_lookup(
        train_dataset, cfg)

    rng = np.random.RandomState(cfg.seed)

    # ---- ZCA whitening (CIFAR path, utils.py:50-105) ----
    zca = None
    if cfg.zca:
        from multimodal_dataset_distillation_tpu.ops.zca import ZCAWhitening

        sample_n = min(len(train_dataset), 2048)
        sample = np.stack([train_dataset[i][0] for i in range(sample_n)])
        zca = ZCAWhitening().fit(sample)
        print(f"Fitted ZCA whitening on {sample_n} train images")

    # ---- synthetic data init (distill_original.py:137-148) ----
    text_encoder = make_text_encoder(cfg)
    image_syn, text_syn = get_images_texts(cfg.num_queries, train_dataset,
                                           text_encoder, rng)
    if cfg.pix_init == "noise":
        image_syn = noise_images(cfg.num_queries, cfg.image_size, rng)
        print("Initialized synthetic image from random noise")
    if cfg.txt_init == "noise":
        text_syn = noise_texts(cfg.num_queries, text_encoder.hidden_size, rng)
        print("Initialized synthetic text from random noise")
    if zca is not None and cfg.pix_init == "real":
        # the reference's CIFAR/--zca path serves pre-whitened images from
        # get_dataset (utils.py:50-105); whiten the real-init pixels here
        image_syn = zca.transform(image_syn)

    # ---- student template + distiller ----
    # transfer (eval_stage) applies ONLY to the periodic eval models
    # (distill.py:307 builds them with eval_stage=args.transfer); the
    # distill students are always plain (distill.py:440: CLIPModel_full(args))
    student_cfg = _student_cfg(cfg)
    model = build_bi_encoder(student_cfg)
    variables = init_bi_encoder(model, student_cfg)

    # data-parallel mesh over all local devices (DataParallel semantics,
    # buffer.py:51-53 / distill.py:443-445 — TPU form): inner minibatches
    # shard over "data", flat students replicate, XLA psums over ICI
    mesh = None
    if cfg.mesh_shape or len(jax.devices()) > 1:
        from multimodal_dataset_distillation_tpu.parallel.mesh import (
            get_mesh,
            maybe_init_distributed,
        )

        maybe_init_distributed()
        mesh = get_mesh(cfg.mesh_shape, cfg.mesh_axes)
        mb = min(cfg.mini_batch_size, cfg.num_queries)
        nd = mesh.shape.get("data", 1)
        if mb % nd:
            # non-divisible counts pad-and-mask inside the Distiller
            # (exact math — the headline nq=100/mb=100 on a v5e-8 runs
            # sharded; DataParallel's uneven scatter, distill.py:443-445)
            print(f"Device mesh: {dict(mesh.shape)} (mini_batch {mb} -> "
                  f"{mb + (-mb) % nd} pad-and-mask)")
        else:
            print(f"Device mesh: {dict(mesh.shape)}")
    distiller = Distiller(student_cfg, model, variables, image_syn, text_syn,
                          mesh=mesh)

    # ---- expert buffers (distill_original.py:170-196) ----
    expert_dir = cfg.buffer_path
    nested = os.path.join(cfg.buffer_path, cfg.dataset, cfg.image_encoder,
                          cfg.text_encoder)
    if not discover_buffers(expert_dir)[0] and discover_buffers(nested)[0]:
        expert_dir = nested
    print(f"Expert Dir: {expert_dir}")
    if not discover_buffers(expert_dir)[0]:
        _bootstrap_dummy_buffers(student_cfg, expert_dir)
    img_files, txt_files = discover_buffers(expert_dir)
    # torch-order codecs for this student: reference-written .pt buffers
    # (module.parameters() order, buffer.py:94-95) are identified by
    # shape signature and converted to ravel order on load
    from multimodal_dataset_distillation_tpu.models.torch_order import (
        codecs_for_student,
    )

    cycler = ExpertCycler(img_files, txt_files, cfg.max_start_epoch,
                          cfg.expert_epochs, cfg.max_files, seed=cfg.seed,
                          load_all=cfg.load_all, max_experts=cfg.max_experts,
                          device_cache_cap=cfg.traj_cache_cap,
                          prefetch=cfg.traj_prefetch,
                          codecs=codecs_for_student(variables["params"]))

    # sanity: buffer width must match this student's flat size
    seg = cycler.img_buffer[0]
    if seg.shape[1] != distiller.img_size:
        raise ValueError(
            f"expert buffer param size {seg.shape[1]} != student flat size "
            f"{distiller.img_size} — buffers were written for a different "
            f"image encoder or config")

    eval_it_pool = set(np.arange(0, cfg.Iteration + 1, cfg.eval_it).tolist())
    history = []

    _eval_init = make_eval_initializer(cfg)

    # ---- mid-run resume (SURVEY.md §5.4 gap in the reference) ----
    from multimodal_dataset_distillation_tpu.engine.checkpoint import (
        load_distill_checkpoint,
        save_distill_checkpoint,
    )

    start_it = 0
    if cfg.resume_from:
        start_it = load_distill_checkpoint(cfg.resume_from, distiller,
                                           cycler=cycler, host_rng=rng) + 1
        print(f"Resumed from {cfg.resume_from} at iteration {start_it}")
    ckpt_dir = os.path.join(cfg.save_dir, cfg.dataset, logger.name)

    # Pipelined host loop: the host reads of step N's metrics (loss
    # print, NaN check, logging — each a device->host round-trip, which
    # over a remote-chip tunnel can rival the step time itself) happen
    # AFTER step N+1 has been dispatched, so the device never idles
    # waiting on the host.  NaN detection is therefore one step delayed
    # — same stopping semantics as the reference's per-iteration bailout
    # (distill.py:599), one extra (discarded) step of compute.
    pending = None  # (it, metrics) of the last dispatched step

    def drain(pending):
        """Sync + log the previous step's metrics; False on NaN.

        On NaN the bailout iteration is recorded as
        ``distiller.nan_bailout_it``; because the loop is pipelined, the
        step AFTER the NaN one was already dispatched, so
        ``distiller.state`` is one (NaN-contaminated) step past the
        detection point — callers must treat it as invalid whenever
        ``nan_bailout_it`` is set.
        """
        if pending is None:
            return True
        pit, metrics = pending
        grand = float(metrics["grand_loss"])
        if math.isnan(float(metrics["img_param_loss"])):
            print("NaN param loss — stopping (distill.py:599)")
            distiller.nan_bailout_it = pit
            return False
        # logged LRs are the PRE-step values, like the reference's
        # per-iteration wandb.log of syn_lr before optimizer.step
        logger.log({"Synthetic_LR_Image": float(metrics["syn_lr_img_pre"]),
                    "Synthetic_LR_Text": float(metrics["syn_lr_txt_pre"])},
                   step=pit)
        logger.log({"Grand_Loss": grand,
                    "Start_Epoch": metrics["_start_epoch"],
                    "img_param_loss": float(metrics["img_param_loss"]),
                    "txt_param_loss": float(metrics["txt_param_loss"])},
                   step=pit)
        if pit % 10 == 0:
            print(f"{get_time()} iter = {pit:04d}, loss = {grand:.4f}")
        return True

    # one eval harness for the whole run: trainers (and their compiled
    # programs) are cached here and re-armed per block instead of being
    # rebuilt — rebuilding recompiled the eval programs every eval_it
    # iterations AND leaked stale device-loaded executables until GC
    # (observed OOM after ~300 iters of a 400-iter soak, QUALITY.md)
    eval_reuse: dict = {}

    def _hbm_probe(tag):
        # MDD_DEBUG_HBM=1: device-memory telemetry for long-run OOM
        # triage (observed: RESOURCE_EXHAUSTED after ~300 iters with
        # periodic evals on a 16 GB v5e — see QUALITY.md soak note)
        if os.environ.get("MDD_DEBUG_HBM") != "1":
            return
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            print(f"[hbm {tag}] in_use="
                  f"{stats.get('bytes_in_use', 0)/2**20:.0f} MiB "
                  f"peak={stats.get('peak_bytes_in_use', 0)/2**20:.0f} MiB "
                  f"largest_free="
                  f"{stats.get('largest_free_block_bytes', 0)/2**20:.0f} MiB",
                  flush=True)
        except Exception as e:  # memory_stats unsupported on some backends
            print(f"[hbm {tag}] unavailable: {e}", flush=True)

    for it in range(start_it, cfg.Iteration + 1):
        # ---- evaluation block (distill_original.py:201-283) ----
        if it in eval_it_pool and cfg.num_eval > 0:
            if not drain(pending):
                pending = None
                break
            pending = None
            _hbm_probe(f"pre-eval it={it}")
            results = []
            eval_cfg = cfg.replace(
                distill=True, lr_net=float(distiller.state.syn_lr_img))
            eval_model = build_bi_encoder(eval_cfg)
            # syn_arrays strips mesh-padding rows (shard_syn on a mesh
            # the query count does not divide)
            img_eval, txt_eval = distiller.syn_arrays()
            if cfg.parallel_eval and cfg.num_eval > 1:
                # all num_eval fresh models as one vmapped program
                # (--parallel_eval; engine/eval.py)
                from multimodal_dataset_distillation_tpu.engine.eval import (
                    evaluate_synset_parallel,
                )

                var_list = [
                    _eval_init(eval_model, eval_cfg, cfg.seed + 1000 + j)
                    for j in range(cfg.num_eval)]
                eval_mesh = (mesh if mesh is not None
                             and cfg.num_eval % mesh.shape.get("data", 1) == 0
                             else None)
                _, results = evaluate_synset_parallel(
                    cfg.num_eval, eval_model, var_list, img_eval, txt_eval,
                    testloader, eval_cfg, bert_test_embed, mesh=eval_mesh,
                    reuse=eval_reuse)
                for it_eval, val in enumerate(results):
                    print(f"Evaluate_{it_eval:02d}: "
                          + " ".join(f"{k}={v:.4f}" for k, v in val.items()))
                    if not cfg.std:
                        logger.log(val, step=it)
            else:
                for it_eval in range(cfg.num_eval):
                    eval_vars = _eval_init(eval_model, eval_cfg,
                                           cfg.seed + 1000 + it_eval)
                    _, acc, val = evaluate_synset(
                        it_eval, eval_model, eval_vars, img_eval, txt_eval,
                        testloader, eval_cfg, bert_test_embed,
                        reuse=eval_reuse)
                    results.append(val)
                    print(f"Evaluate_{it_eval:02d}: "
                          + " ".join(f"{k}={v:.4f}" for k, v in val.items()))
                    if not cfg.std:
                        logger.log(val, step=it)
            if cfg.std and results:
                agg = {}
                for k in results[0]:
                    vals = [r[k] for r in results]
                    agg[f"Mean/{k}"] = float(np.mean(vals))
                    agg[f"Std/{k}"] = float(np.std(vals))
                logger.log(agg, step=it)
            history.append((it, results))

            _hbm_probe(f"post-eval it={it}")

            if cfg.draw:
                run_dir = os.path.join(cfg.save_dir, cfg.dataset, logger.name)
                arts = save_visualizations(
                    run_dir, it, img_eval, txt_eval, train_sentences,
                    train_caption_embed, zca=zca,
                    # grid/sentence PNG saves are gated exactly like the
                    # reference (distill.py:368: ipc < 50 or --force_save);
                    # the distilled-tensor npz always saves
                    save_grids=cfg.ipc < 50 or cfg.force_save,
                    syn_lrs=(distiller.state.syn_lr_img,
                             distiller.state.syn_lr_txt),
                    save_pt=cfg.save_pt)
                # rich-artifact parity with the reference's per-eval wandb
                # logging (distill.py:386-394): image grids, pixel/text
                # histograms, decoded-sentence HTML table
                for k in ("grid", "clipped_2.5", "zca_grid"):
                    if k in arts:
                        logger.log_image(f"Synthetic_Images/{k}", arts[k],
                                         step=it)
                logger.log_histogram("Synthetic_Pixels", img_eval, step=it)
                logger.log_histogram("Synthetic_Texts", txt_eval, step=it)
                if "sentences" in arts:
                    with open(arts["sentences"]) as f:
                        html = "<br>".join(line.strip() for line in f)
                    logger.log_html("Synthetic_Sentences", html, step=it,
                                    path=arts["sentences"])

        # ---- one outer step (HBM-resident expert trajectories) ----
        if cfg.profile_dir and it == 2:  # trace one post-compile step
            from multimodal_dataset_distillation_tpu.utils.logging import (
                Profiler,
            )

            with Profiler(cfg.profile_dir):
                traj_img, traj_txt, start_epoch = cycler.next_segment_device()
                idx_seq = distiller.sample_indices(rng)
                metrics = distiller.step_traj(traj_img, traj_txt,
                                              start_epoch, idx_seq)
                jax.block_until_ready(metrics["grand_loss"])
        else:
            traj_img, traj_txt, start_epoch = cycler.next_segment_device()
            idx_seq = distiller.sample_indices(rng)
            metrics = distiller.step_traj(traj_img, traj_txt, start_epoch,
                                          idx_seq)
        metrics["_start_epoch"] = start_epoch

        # sync + log the PREVIOUS step while this one runs on device
        if not drain(pending):
            pending = None
            break
        pending = (it, metrics)

        if cfg.ckpt_it and it % cfg.ckpt_it == 0 and it > start_it:
            if not drain(pending):
                pending = None
                break
            pending = None
            p = save_distill_checkpoint(
                os.path.join(ckpt_dir, f"distill_ckpt_{it}.msgpack"),
                distiller, it, cycler=cycler, host_rng=rng)
            print(f"Checkpointed outer loop -> {p}")

    drain(pending)
    cycler.close()  # stop the prefetch worker / drop in-flight transfers
    logger.finish()
    return distiller, history


if __name__ == "__main__":
    main(parse_config(defaults=Config(image_encoder="nfnet", Iteration=5000)))
