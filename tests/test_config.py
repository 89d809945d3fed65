"""Config + reference-flag argparse shim."""

from multimodal_dataset_distillation_tpu.config import Config, parse_config


def test_baseline_pinned_flags():
    cfg = parse_config([
        "--dataset=flickr", "--syn_steps=8", "--expert_epochs=1",
        "--lr_img=1000", "--lr_txt=1000", "--lr_lr=0.01",
        "--num_queries=100"])
    assert cfg.syn_steps == 8
    assert cfg.expert_epochs == 1
    assert cfg.lr_img == 1000.0 and cfg.lr_txt == 1000.0
    assert cfg.lr_lr == 0.01
    assert cfg.num_queries == 100


def test_unknown_flags_tolerated():
    # reference uses parse_known_args (distill.py:680)
    cfg = parse_config(["--dataset=coco", "--totally_unknown_flag=1"])
    assert cfg.dataset == "coco"


def test_bool_flag_parsing():
    cfg = parse_config(["--text_pretrained=False", "--distill=True",
                        "--dsa=False"])
    assert cfg.text_pretrained is False
    assert cfg.distill is True
    assert cfg.dsa is False


def test_store_true_flags():
    cfg = parse_config(["--zca", "--decay", "--disable_wandb"])
    assert cfg.zca and cfg.decay and cfg.disable_wandb


def test_perf_knob_flags():
    cfg = parse_config(["--stem_s2d=True", "--scan_unroll=4",
                        "--hvp_mode=forward"])
    assert cfg.stem_s2d is True
    assert cfg.scan_unroll == 4
    assert parse_config([]).stem_s2d is False  # default off


def test_embedding_dims_table():
    # networks.py:810-826 conventions
    assert Config(image_encoder="nfnet").image_embedding == 2304
    assert Config(image_encoder="nfnet", transfer=True).image_embedding == 1000
    assert Config(image_encoder="convnet").image_embedding == 768
    assert Config(image_encoder="resnet18").image_embedding == 512
    assert Config(image_encoder="resnet50").image_embedding == 1000
    assert Config(text_encoder="bert").text_embedding == 768
    assert Config(text_encoder="clip").text_embedding == 512


def test_transfer_applies_only_to_eval_models():
    """--transfer (eval_stage) must not leak into the distill students or
    phase-1 teachers: the reference builds only the eval model with
    eval_stage=args.transfer (distill.py:307); students (distill.py:440)
    and teachers (buffer.py:46, which has no --transfer flag at all) are
    plain.  A leaked transfer head would change the student flat width
    and break against every expert buffer."""
    from multimodal_dataset_distillation_tpu.cli.distill import _student_cfg
    from multimodal_dataset_distillation_tpu.models.clip_model import (
        build_bi_encoder,
    )

    cfg = parse_config(["--transfer=True", "--image_encoder=nfnet"])
    assert cfg.transfer is True
    s = _student_cfg(cfg)
    assert s.distill is True and s.transfer is False
    # dim table (networks.py:810-819): eval model 1000-d head, student 2304-d
    assert build_bi_encoder(cfg.replace(distill=True)).image_embedding == 1000
    assert build_bi_encoder(s).image_embedding == 2304
