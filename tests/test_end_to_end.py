"""End-to-end slice: expert training -> buffer file -> distillation -> eval.

SURVEY.md §7 minimum slice / BASELINE config #1 analog, fully offline:
tiny synthetic VL dataset, convnet_tiny encoder, tiny BERT, 1 expert x 2
epochs -> buffer -> distiller (num_queries=8, syn_steps=2, 3 iterations)
-> evaluate_synset producing R@k.
"""

import os

import numpy as np
import pytest

from multimodal_dataset_distillation_tpu.config import Config


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    return Config(
        dataset="synthetic", synthetic_size=32, synthetic_test_size=8,
        image_encoder="convnet_tiny", image_size=16,
        text_encoder_config="tiny", text_pretrained=False,
        num_experts=1, train_epochs=2,
        lr_teacher_img=0.05, lr_teacher_txt=0.05,
        batch_size_train=8, batch_size_test=8, batch_train=8,
        num_queries=8, syn_steps=2, mini_batch_size=4, expert_epochs=1,
        max_start_epoch=2, Iteration=3, eval_it=3, num_eval=1,
        epoch_eval_train=1, k_test=4, num_workers=2,
        buffer_path=str(root / "buffers"), save_dir=str(root / "logs"),
        disable_wandb=True, draw=True, seed=0)


@pytest.fixture(scope="module")
def _chdir_tmp(tmp_path_factory):
    # text-embed npz caches write to CWD-relative paths
    d = tmp_path_factory.mktemp("cwd")
    old = os.getcwd()
    os.chdir(d)
    yield d
    os.chdir(old)


def test_full_pipeline(tiny_cfg, _chdir_tmp):
    from multimodal_dataset_distillation_tpu.cli.buffer import main as buffer_main
    from multimodal_dataset_distillation_tpu.cli.distill import main as distill_main
    from multimodal_dataset_distillation_tpu.engine.buffer_io import discover_buffers

    # phase 1: expert trajectories
    saved = buffer_main(tiny_cfg)
    assert saved == [0]
    save_dir = os.path.join(tiny_cfg.buffer_path, "synthetic",
                            "convnet_tiny", "bert")
    img_files, txt_files = discover_buffers(save_dir)
    assert len(img_files) == 1 and len(txt_files) == 1
    # .pt interop artifact exists too
    assert any(f.endswith((".pt", ".npz")) for f in img_files)
    assert os.path.exists(os.path.join(save_dir, "img_replay_buffer_0.pt"))

    # phase 2+3: distillation with periodic evaluation
    distill_cfg = tiny_cfg.replace(buffer_path=save_dir)
    distiller, history = distill_main(distill_cfg)

    # loss was finite and the synthetic data moved
    assert np.isfinite(float(distiller.state.syn_lr_img))
    # eval produced retrieval metrics with all keys
    assert history, "no eval results recorded"
    _, results = history[0]
    assert set(results[0]) == {"txt_r1", "txt_r5", "txt_r10", "txt_r_mean",
                               "img_r1", "img_r5", "img_r10", "img_r_mean",
                               "r_mean"}
    # artifacts: PNG grid + sentences + distilled tensors
    run_dirs = os.path.join(distill_cfg.save_dir, "synthetic")
    assert os.path.isdir(run_dirs)
    found = []
    for root, _dirs, files in os.walk(run_dirs):
        found.extend(files)
    assert any(f.startswith("synthetic_images_") for f in found)
    assert any(f.startswith("synthetic_sentences_") for f in found)
    assert any(f.startswith("distilled_") for f in found)


def test_nan_bailout_stops_loop(tmp_path, _chdir_tmp):
    """The pipelined driver loop must stop on a NaN param loss (the
    reference's bailout, distill.py:599) — detection is one step delayed
    by design, so the loop must terminate early, not run to Iteration."""
    from multimodal_dataset_distillation_tpu.cli.distill import main as distill_main

    cfg = Config(
        dataset="synthetic", synthetic_size=16, synthetic_test_size=8,
        image_encoder="convnet_tiny", image_size=16,
        text_encoder_config="tiny", text_pretrained=False,
        num_queries=8, syn_steps=2, mini_batch_size=4, expert_epochs=1,
        max_start_epoch=1, Iteration=50, eval_it=100, num_eval=0,
        batch_size_train=8, batch_size_test=8, batch_train=8,
        # absurd inner LR seeds: the student update explodes to inf/NaN
        # within a few outer steps
        lr_teacher_img=1e30, lr_teacher_txt=1e30,
        lr_img=10.0, lr_txt=10.0, lr_lr=0.0,
        buffer_path=str(tmp_path / "nobuffers"), save_dir=str(tmp_path),
        disable_wandb=True, draw=False, seed=0)
    distiller, history = distill_main(cfg)
    # the loop stopped well before Iteration: non-NaN Grand_Loss entries
    # in the run log are the completed (drained) steps
    import json as _json

    logs = [p for p in os.listdir(tmp_path) if p.endswith(".jsonl")]
    assert logs, "run log missing"
    n_steps = 0
    with open(os.path.join(tmp_path, logs[0])) as f:
        for line in f:
            if "Grand_Loss" in line:
                n_steps += 1
    assert n_steps < cfg.Iteration, (
        f"NaN bailout did not stop the loop ({n_steps} steps logged)")


def test_buffer_pt_roundtrip(tmp_path):
    """torch .pt container format round-trips through our codec."""
    import jax
    import jax.numpy as jnp

    from multimodal_dataset_distillation_tpu.engine.buffer_io import (
        load_buffer,
        save_trajectories_pt,
        stack_trajectory,
    )
    from multimodal_dataset_distillation_tpu.models.projection import ProjectionHead

    m = ProjectionHead(embedding_dim=8, projection_dim=4)
    p0 = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))["params"]
    p1 = jax.tree_util.tree_map(lambda x: x + 1.0, p0)
    traj = [p0, p1]

    path = str(tmp_path / "img_replay_buffer_0.pt")
    save_trajectories_pt(path, [traj])
    loaded = load_buffer(path)
    assert len(loaded) == 1
    np.testing.assert_allclose(loaded[0], stack_trajectory(traj), rtol=1e-6)

    # and torch itself can read the file in the reference's shape
    import torch

    payload = torch.load(path, weights_only=False)
    assert isinstance(payload, list)            # list of trajectories
    assert isinstance(payload[0], list)         # list of snapshots
    assert isinstance(payload[0][0], list)      # list of per-param tensors
    assert all(isinstance(t, torch.Tensor) for t in payload[0][0])


def test_generic_timm_ckpt_env_ignored_for_non_timm_encoder(
        tmp_path, _chdir_tmp, monkeypatch):
    """A leftover generic $MDD_TIMM_CKPT (e.g. from an nfnet buffer run)
    must not be force-fed to a non-timm eval student: the eval-student
    import is gated on the timm arch table, so distill with
    image_encoder=convnet_tiny runs its eval block from random init
    instead of raising KeyError('convnet_tiny') at the first eval."""
    import torch

    from multimodal_dataset_distillation_tpu.cli.distill import (
        main as distill_main,
    )

    ckpt = tmp_path / "nfnet_l0_fake.pth"
    torch.save({"stem.conv1.weight": torch.zeros(16, 3, 3, 3)}, str(ckpt))
    monkeypatch.setenv("MDD_TIMM_CKPT", str(ckpt))

    cfg = Config(
        dataset="synthetic", synthetic_size=16, synthetic_test_size=8,
        image_encoder="convnet_tiny", image_size=16,
        text_encoder_config="tiny", text_pretrained=False,
        image_pretrained=True,  # the reference default
        num_queries=4, syn_steps=1, mini_batch_size=2, expert_epochs=1,
        max_start_epoch=1, Iteration=1, eval_it=1, num_eval=1,
        epoch_eval_train=1, k_test=4, num_workers=2,
        batch_size_train=8, batch_size_test=8, batch_train=4,
        lr_teacher_img=0.05, lr_teacher_txt=0.05,
        lr_img=10.0, lr_txt=10.0, lr_lr=0.01,
        buffer_path=str(tmp_path / "nobuffers"),
        save_dir=str(tmp_path / "logs"), disable_wandb=True, draw=False,
        seed=0)
    _, history = distill_main(cfg)  # must not raise
    assert history, "eval block did not run"


def _find_or_make_distilled_npz(tiny_cfg, _chdir_tmp):
    """Locate a distilled npz from the pipeline test (same-module order);
    regenerate standalone if absent (dummy-buffer bootstrap, 0 iters)."""
    from multimodal_dataset_distillation_tpu.cli.distill import main as distill_main

    found = None
    base = os.path.join(tiny_cfg.save_dir, "synthetic")
    for root, _dirs, files in os.walk(base):
        for f in files:
            if f.startswith("distilled_"):
                found = os.path.join(root, f)
    if found is None:
        cfg0 = tiny_cfg.replace(
            buffer_path=str(_chdir_tmp / "fresh_buffers"), Iteration=0,
            eval_it=1, save_dir=str(_chdir_tmp / "fresh_logs"))
        distill_main(cfg0)
        for root, _dirs, files in os.walk(cfg0.save_dir):
            for f in files:
                if f.startswith("distilled_"):
                    found = os.path.join(root, f)
    assert found, "no distilled npz produced"
    return found


def test_eval_distilled_cli(tiny_cfg, _chdir_tmp):
    """eval_distilled CLI: re-evaluate a persisted distilled_{it}.npz with
    fresh models — a capability the reference lacks entirely (it comments
    out its tensor saves, distill_original.py:292-296)."""
    from multimodal_dataset_distillation_tpu.cli.eval_distilled import main as eval_main

    found = _find_or_make_distilled_npz(tiny_cfg, _chdir_tmp)

    payload = np.load(found)
    # round-3 saves persist the learned inner LRs (lr_net of the eval)
    assert "syn_lr_img" in payload and "syn_lr_txt" in payload

    cfg = tiny_cfg.replace(distilled_npz=found, num_eval=2, std=True,
                           parallel_eval=False)
    results = eval_main(cfg)
    assert len(results) == 2
    keys = {"txt_r1", "txt_r5", "txt_r10", "txt_r_mean",
            "img_r1", "img_r5", "img_r10", "img_r_mean", "r_mean"}
    for r in results:
        assert set(r) == keys
        assert all(np.isfinite(v) for v in r.values())


def test_eval_distilled_pt_pair(tiny_cfg, _chdir_tmp):
    """--save_pt round trip: the reference-named images_{it}.pt /
    labels_{it}.pt pair is accepted by eval_distilled directly (NCHW ->
    NHWC), producing the same metrics as the sibling npz (the arrays are
    identical; only the container differs — the learned-LR default also
    matches because the npz embeds what the run learned and the .pt path
    falls back to --lr_net)."""
    import torch

    from multimodal_dataset_distillation_tpu.cli.eval_distilled import (
        main as eval_main,
    )

    found = _find_or_make_distilled_npz(tiny_cfg, _chdir_tmp)
    payload = np.load(found)
    d = os.path.dirname(found)
    torch.save(torch.from_numpy(
        payload["image_syn"].transpose(0, 3, 1, 2).copy()),
        os.path.join(d, "images_9.pt"))
    torch.save(torch.from_numpy(payload["text_syn"].copy()),
               os.path.join(d, "labels_9.pt"))

    lr = float(payload["syn_lr_img"])
    base = tiny_cfg.replace(num_eval=1, std=False, parallel_eval=False,
                            lr_net=lr)
    r_npz = eval_main(base.replace(distilled_npz=found))
    r_pt = eval_main(base.replace(
        distilled_npz=os.path.join(d, "images_9.pt")))
    assert r_pt[0] == r_npz[0]


def test_eval_distilled_explicit_lr_net_overrides(tiny_cfg, _chdir_tmp,
                                                  monkeypatch, capsys):
    """Precedence: explicit --lr_net > npz-embedded learned LR > default
    (an LR sweep over a saved set must not be pinned to the embedded
    value)."""
    import sys

    from multimodal_dataset_distillation_tpu.cli.eval_distilled import (
        main as eval_main,
    )

    found = _find_or_make_distilled_npz(tiny_cfg, _chdir_tmp)
    assert "syn_lr_img" in np.load(found)  # embedded LR present...

    monkeypatch.setattr(sys, "argv",
                        ["eval_distilled.py", "--lr_net=0.123"])
    cfg = tiny_cfg.replace(distilled_npz=found, num_eval=1, std=False,
                           parallel_eval=False, lr_net=0.123)
    results = eval_main(cfg)
    out = capsys.readouterr().out
    assert "explicit --lr_net" in out  # ...but the flag wins
    assert len(results) == 1 and np.isfinite(results[0]["r_mean"])
