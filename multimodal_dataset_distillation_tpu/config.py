"""Typed configuration core + reference-compatible argparse shims.

The reference (kushal-bhargav/multimodal_dataset_distillation) configures
each entry point with its own argparse block (``buffer.py:118-161``,
``distill.py:623-683``, ``distill_original.py:499-583``,
``Buffer_ROCO_Test.py:281-323``).  Here a single typed :class:`Config`
dataclass is the source of truth, and :func:`add_reference_flags` exposes
the union of the reference's public flag names so existing command lines
keep working (BASELINE pins ``--syn_steps --expert_epochs --lr_img
--lr_txt --lr_lr --num_queries`` as must-preserve).

Reference `type=bool` flags (an argparse footgun: any non-empty string is
truthy) are re-exposed with a proper str->bool parser while keeping the
flag names.
"""

from __future__ import annotations

import argparse
import dataclasses
import datetime
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple


def _str2bool(v: Any) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("true", "1", "yes", "t", "y")


@dataclass
class Config:
    """Union of the reference's public configuration surface, typed.

    Field names mirror the reference flag names exactly (SURVEY.md §2.7).
    TPU-specific additions live at the bottom and default to values that
    reproduce reference semantics.
    """

    # ---- dataset / paths ----
    dataset: str = "flickr"              # flickr | coco | roco | cifar10_vl | synthetic
    image_root: str = "./Flickr30k/flickr-image-dataset/flickr30k-images/"
    ann_root: str = "./Flickr30k/ann_file/"
    data_path: str = "./data/Flickr30k/"
    buffer_path: str = "./buffers"
    save_dir: str = "./logged_files"

    # ---- expert (buffer) phase ----
    num_experts: int = 100
    train_epochs: int = 50
    lr_teacher_img: float = 0.1
    lr_teacher_txt: float = 0.1
    mom: float = 0.0
    l2: float = 0.0
    decay: bool = False
    save_interval: int = 10

    # ---- distillation phase ----
    Iteration: int = 50000
    syn_steps: int = 20
    expert_epochs: int = 3
    max_start_epoch: int = 25
    num_queries: int = 100
    mini_batch_size: int = 100
    lr_img: float = 1000.0
    lr_txt: float = 1000.0
    lr_lr: float = 1e-3
    pix_init: str = "real"               # real | noise
    txt_init: str = "real"               # real | noise
    max_files: Optional[int] = None
    max_experts: Optional[int] = None
    load_all: bool = False
    texture: bool = False
    canvas_size: int = 2
    canvas_samples: int = 1
    basis: bool = False
    n_basis: int = 64
    recursive: bool = False
    optimize: str = "reparam"            # reparam | ift

    # ---- evaluation ----
    eval_it: int = 50
    num_eval: int = 5
    epoch_eval_train: int = 1
    batch_train: int = 128
    eval_mode: str = "S"
    transfer: bool = False
    std: bool = False
    k_test: int = 128

    # ---- model ----
    image_encoder: str = "nfnet"         # nfnet | vit | nf_resnet50 | nf_regnet | resnet50 | resnet18 | resnet18_gn | convnet | ...
    text_encoder: str = "bert"           # bert | clip
    image_pretrained: bool = True
    text_pretrained: bool = True
    image_trainable: bool = True
    text_trainable: bool = False
    only_has_image_projection: bool = False
    distill: bool = False
    image_size: int = 224

    # ---- augmentation ----
    dsa: bool = True
    dsa_strategy: str = "color_crop_cutout_flip_scale_rotate"
    zca: bool = False
    no_aug: bool = False

    # ---- data loading ----
    batch_size_train: int = 128
    batch_size_test: int = 128
    load_npy: bool = False
    num_workers: int = 4

    # ---- misc (reference surface) ----
    draw: bool = True
    force_save: bool = False
    # ALSO write the reference's torch tensor artifacts next to the npz:
    # images_{it}.pt (NCHW float32) / labels_{it}.pt (text embeddings) —
    # the saves distill_original.py:292-296 left commented out — and,
    # under --zca, the fork's live images_zca_{it}.pt (distill.py:410).
    # Lets torch pipelines consume a distilled set without reading npz.
    save_pt: bool = False
    ipc: int = 1
    name: str = field(
        default_factory=lambda: datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
    )
    # wandb on by default like the reference (only Buffer_ROCO_Test honors
    # the disable flag there; here it works everywhere and degrades to
    # JSONL when wandb is unavailable — WANDB_MODE=offline is forced so
    # air-gapped runs never block on network)
    disable_wandb: bool = False
    distributed: bool = False
    margin: float = 0.2
    measure: str = "cosine"
    max_violation: bool = False
    grounding: bool = False

    # ---- TPU-native additions ----
    # Numerics convention for the *inner* distillation loss logit scale.
    #   "fixed":  raw log(1/0.07) ~= 2.659 (upstream distill_original.py:103,430)
    #   "syn_lr": the learnable inner image LR doubles as the scale (fork distill.py:548)
    inner_scale: str = "fixed"
    # dtype of inner-unroll compute ("float32" for parity, "bfloat16" for speed)
    inner_dtype: str = "float32"
    # expert-phase compute dtype ("bfloat16" = the fork's AMP epoch,
    # epoch.py:59-98, in TPU form: in-graph casts, f32 master params)
    train_dtype: str = "float32"
    # jax.checkpoint each inner step (memory/time tradeoff for long
    # unrolls).  NB the four remat_* knobs below apply ONLY to
    # hvp_mode="reverse" (the custom forward-HVP VJP replaces remat; its
    # own memory dials are fr_remat/fr_resid_dtype/fr_bwd).  They are
    # kept because reverse mode remains the cross-check path and the
    # only mode where JAX's default reverse-over-reverse is exercised.
    remat_inner: bool = True
    # checkpoint every N inner steps instead of every step (N must divide
    # syn_steps; larger N = more memory, less recompute)
    remat_group: int = 1
    # jax.checkpoint policy for the inner-step remat: "none" (recompute
    # everything), "dots" (save matmul/conv results), "dots_no_batch"
    remat_policy: str = "none"
    # prevent_cse on the inner-step jax.checkpoint. False is safe under
    # lax.scan (the scan boundary is already a CSE barrier) and lets XLA
    # fuse the recomputation with the backward pass
    remat_prevent_cse: bool = True
    # lax.scan unroll factor for the inner-step scan (XLA scheduling
    # knob).  Default 2: measured best-or-equal at every scaled config
    # in a same-session v5e-1 sweep (DESIGN §10 scaling table — stress
    # nq=500/syn_steps=20: 3.50 s/step vs 3.75 at unroll=1 (+7%) and
    # 3.61 at unroll=4; nq=1000/syn_steps=8: 1.35 s/step vs 1.37, +1.6%;
    # the flagship quality runs all use 2) while keeping the temp
    # footprint far from the unroll=8 OOM cliff next to resident
    # trajectories (QUALITY.md).  The headline bench pins 8 explicitly
    # (nq=100, syn_steps=8 fully interleaved is another +16% THERE but
    # OOMs at larger nq/syn_steps).
    scan_unroll: int = 2
    # meta-backward strategy through each inner SGD step:
    #   "reverse": JAX default — remat the fwd+bwd, VJP through both
    #              (reverse-over-reverse, ~9 fwd-equivalents/step)
    #   "forward": custom VJP — one grad-of-jvp supplies the Hessian and
    #              mixed terms (reverse-over-forward, ~4-5 fwd-equiv/step,
    #              no remat; residuals are (th, g, x, y) per step).
    # Identical math; pinned by float64 FD tests + torch parity harness.
    # "forward" is the default: measured faster on v5e (0.823 vs 0.778
    # steps/s sync) and OOM-free at the headline config where noremat
    # reverse OOMs.  Use "reverse" to cross-check or for remat_policy
    # experiments (remat flags only apply in reverse mode).
    hvp_mode: str = "forward"
    # hvp_mode="forward" memory controls (the headline-step HBM levers,
    # DESIGN.md §10: 15.6 GB temps -> ~175 GiB/step spill DMA competing
    # with the conv traffic for HBM bandwidth):
    #   fr_resid_dtype: dtype of the per-step custom-VJP residuals
    #     (theta, g per modality — ~2.2 GB/step-unroll at NFNet-L0 scale).
    #     "carry" stores them in the f32 carry dtype; "inner" stores them
    #     in inner_dtype (bf16 halves them).  EXACT for the theta path
    #     when inner_dtype=bfloat16: the forward computes with cast(theta)
    #     and the backward re-upcasts the stored bf16 to the identical
    #     cast point.  Only the scalar inner-LR cotangent <g, ybar> sees
    #     the rounding (~1e-3 relative).
    #   fr_remat: jax.checkpoint policy applied to the inner contrastive
    #     loss inside the forward-HVP fwd/bwd. "none" saves the full
    #     (primal+tangent) activation set per step; "full" saves nothing
    #     (replays); "names" saves only the tagged NF-net block outputs
    #     (models/nfnet.py checkpoint_name tags); "dots_no_batch" saves
    #     weight-shaped matmul operands.  Bit-exact (scheduling only).
    fr_resid_dtype: str = "carry"        # carry | inner
    fr_remat: str = "none"               # none | full | names | dots_no_batch
    # orientation of the second-order transform in the forward-HVP
    # backward (identical math — symmetry of second derivatives):
    #   "rof": grad of the directional derivative (reverse-over-forward);
    #          retains the doubled primal+tangent graph before
    #          transposing (deep memory peak)
    #   "for": jvp through grad(closs) (forward-over-reverse); tangents
    #          stream with the primal gradient — flatter peak
    fr_bwd: str = "rof"                  # rof | for
    # what the inner-unroll scan carries (engine/distill.py):
    #   "flat": buffer-format flat param vectors — one carry buffer per
    #           modality, XLA aliases updates across a fully-unrolled
    #           scan (fastest on v5e at scan_unroll=8)
    #   "tree": the param pytree, unraveled once per outer step — far
    #           fewer device ops; better for small models / memory
    #           profiling, but defeats buffer aliasing at high unroll
    carry_mode: str = "flat"
    # evaluate all --num_eval synset models as ONE vmapped program
    # (engine/eval.py::evaluate_synset_parallel) instead of the
    # reference's sequential loop (distill.py:303-328).  ON by default:
    # per-model RNG streams are parity-exact with the sequential path
    # (same dropout chains, same batch order; tests/test_parallel_eval.py)
    # and the vmapped program cuts eval wall time ~num_eval-fold.
    # --parallel_eval=False restores the reference-sequential loop.
    parallel_eval: bool = True
    # NOTE: a carry_dtype=bfloat16 mode (checkpoint the unroll carry in
    # bf16) was measured in round 1 and REMOVED: 3x slower (the per-step
    # 160 MB cast pairs break XLA fusion) and ~25-30% inner-LR grad drift.
    # shard the synthetic tensors (image_syn/text_syn), their
    # meta-gradients, and the outer optimizer state over the mesh "data"
    # axis (query dim 0). At num_queries=500 the pixel tensor is ~300 MB
    # and its meta-gradient scatter dominates the inner step; sharding
    # splits both 1/N per device. Applies whenever a mesh is active: a
    # query count that does not divide the data axis is padded with inert
    # rows (zero meta-gradient, stripped by Distiller.syn_arrays).
    # Indices stay global, so semantics and gradients are identical to
    # the unsharded path.
    shard_syn: bool = True
    # run NF-net grouped 3x3 convs through the pallas im2col kernel
    # (ops/pallas_gconv.py) instead of XLA's rank-5 grouped lowering.
    # Exact same math to arbitrary derivative order; non-TPU platforms
    # lower to the lax reference.  Forced off when a >1-device mesh is
    # active (GSPMD cannot partition the pallas call).  Env override:
    # MDD_PALLAS_GCONV=0/1.
    pallas_gconv: bool = False
    # run NF stems (deep_quad/7x7_pool/3x3) in space-to-depth
    # coordinates (ops/s2d.py):
    # exact-math layout rewrite that defeats the batch-minor lane
    # padding XLA picks for the narrow-channel 112^2 stem convs.  Same
    # parameter tree, same outputs (float-reassociation tolerance).
    # Env override for A/B: MDD_STEM_S2D=1.
    stem_s2d: bool = False
    # merged-tangent conv rule in the forward-HVP backward
    # (ops/fused_jvp.py): the share-x {primal, weight-tangent} conv pair
    # of the inner jvp becomes ONE conv with per-group doubled output
    # channels — one fewer activation read per conv site in the tangent
    # forward and its transpose, and the NF grouped 3x3s run 128 lanes
    # wide instead of 64 on the 128-lane MXU.  Exact math (per-output-
    # channel conv arithmetic is independent of the other channels;
    # f64-parity tested).  Applies only when hvp_mode="forward" and
    # fr_bwd="rof".  Env override for A/B: MDD_FUSED_JVP=0/1.
    # Default ON since the v5e-1 headline A/B: 0.8685 steps/s vs 0.8562
    # plain (+1.4%), temps 15 607 -> 14 792 MiB (DESIGN.md §10).
    fused_jvp: bool = True
    # device mesh shape; data axis shards batches, model axis reserved.
    mesh_shape: Tuple[int, ...] = ()
    mesh_axes: Tuple[str, ...] = ("data",)
    # tiny text-encoder for offline/CI runs (no HF weights needed)
    text_encoder_config: str = "base"    # base | tiny
    seed: int = 0
    # synthetic (fake) dataset controls, used by dataset="synthetic" and tests
    synthetic_size: int = 64
    synthetic_test_size: int = 16
    profile_dir: Optional[str] = None
    # mid-run checkpoint/resume of the outer distillation loop (a gap in
    # the reference, SURVEY.md §5.4): save every ckpt_it iterations (0 =
    # off), resume from a distill_ckpt_*.msgpack path
    ckpt_it: int = 0
    resume_from: str = ""
    # path to a saved distilled_{it}.npz for the eval_distilled CLI
    # (re-runs the standard synset evaluation on a persisted distilled
    # set — impossible in the reference, which never saves the tensors;
    # accepts distilled_{it}.npz or a --save_pt images_{it}.pt pair)
    distilled_npz: str = ""
    # expert-parallel training: vmap K independent experts into one XLA
    # program (the reference trains them sequentially, buffer.py:42);
    # shards over the mesh data axis when a mesh is active
    parallel_experts: int = 1
    # C++ fastimage JPEG decode for the train input pipeline (GIL-free
    # thread pool, DCT-scaled decode); PIL fallback per image
    native_decode: bool = True
    # run RandAugment(2,5) + CLIP normalization inside the jitted expert
    # step (loaders emit raw [0,255] crops); host PIL RandAugment when off.
    # MEASURED (tools/roofline_expert.py, v5e-1, batch 128 @224): the
    # in-step augment makes the expert step 3.28 s vs 42 ms — the
    # vmapped per-image op switch lowers to all-branches select and the
    # equalize histogram one-hots dominate (~8.7 TB accessed/step).
    # Host-side threaded RandAugment (fastimage/PIL) is the production
    # path; keep this OFF unless the host loader is the proven
    # bottleneck AND the op set is trimmed.
    device_augment: bool = False
    # HBM cache capacity for device-resident expert trajectories
    # (ExpertCycler): each NFNet-L0 trajectory slice is GBs; the cyclic
    # access pattern uses MRU-excluding-newest eviction (cap-1 pinned +
    # 1 rotating slot).  Size it so cap * trajectory_bytes fits next to
    # the step temps; <=0 disables device caching (re-upload per step)
    traj_cache_cap: int = 4
    # overlap the NEXT trajectory's host->device transfer with the
    # running outer step (one-step-lookahead worker thread): hides the
    # rotation-miss transfer cost when more trajectories cycle than
    # traj_cache_cap can pin (the reference-scale case: 20-100 experts).
    # cache + in-flight stays <= traj_cache_cap; no-op when all fit
    traj_prefetch: bool = True
    # optional global-norm clipping of the three outer distillation
    # gradients (0 = off = reference behavior); guards against the
    # syn_lr runaway divergence mode at aggressive outer LRs
    max_grad_norm: float = 0.0
    # distill only one modality (declared-but-dead flags in the reference,
    # distill_original.py:578-579; implemented here: the other modality's
    # synthetic data and inner LR stay frozen)
    image_only: bool = False
    text_only: bool = False

    # ---- derived / runtime (not flags) ----
    lr_net: float = 0.1                  # set from learned syn_lr at eval time
    device: str = "tpu"

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    @property
    def image_embedding(self) -> int:
        """Projection target dim per image encoder (networks.py:810-819)."""
        table = {
            "nfnet": 1000 if self.transfer else 2304,
            "convnet": 768,
            "resnet18": 512,
            "convnext": 640,
            "nf_tiny": 128,
            "convnet_tiny": 64,
        }
        return table.get(self.image_encoder, 1000)

    @property
    def text_embedding(self) -> int:
        """Text encoder output dim (networks.py:821-826)."""
        if self.text_encoder == "clip":
            return 512
        if self.text_encoder == "bert":
            return 768
        raise NotImplementedError(f"Unsupported text encoder: {self.text_encoder}")


# Flags whose reference declaration used `type=bool`; we parse them properly.
_BOOL_VALUED = {
    "text_pretrained", "image_pretrained", "text_trainable", "image_trainable",
    "load_npy", "only_has_image_projection", "grounding", "distill", "draw",
    "transfer", "std", "load_all", "texture", "recursive",
}
# Flags declared as store_true in the reference (+ new boolean switches
# that default to False).
_STORE_TRUE = {
    "zca", "decay", "max_violation", "force_save", "disable_wandb",
    "distributed", "no_aug", "basis", "device_augment",
}
# `--dsa` is a str choice {'True','False'} in the reference.
_TRISTATE_STR = {"dsa"}


def add_reference_flags(parser: argparse.ArgumentParser,
                        defaults: Optional[Config] = None) -> argparse.ArgumentParser:
    """Register the full union of reference flags on ``parser``."""
    cfg = defaults or Config()
    parser.add_argument("--mesh_shape", type=str,
                        default=",".join(map(str, cfg.mesh_shape)),
                        help="device mesh shape, e.g. '8' or '4,2' "
                             "(default: all devices on the data axis)")
    parser.add_argument("--mesh_axes", type=str,
                        default=",".join(cfg.mesh_axes))
    # lr_net IS exposed (unlike the reference, where it exists only as a
    # programmatic attribute set from the learned syn_lr, distill.py:312):
    # the distill eval block still overwrites it with the learned LR each
    # eval, but eval_distilled.py needs the override for npz saves that
    # predate the embedded syn_lr_img.
    for f in dataclasses.fields(Config):
        if f.name in ("mesh_shape", "mesh_axes", "device"):
            continue
        flag = f"--{f.name}"
        default = getattr(cfg, f.name)
        if f.name in _TRISTATE_STR:
            parser.add_argument(flag, type=str, default="True" if default else "False",
                                choices=["True", "False"])
        elif f.name in _STORE_TRUE:
            parser.add_argument(flag, action="store_true", default=default)
        elif f.name in _BOOL_VALUED:
            parser.add_argument(flag, type=_str2bool, default=default)
        elif f.type in ("Optional[int]",) or f.name in ("max_files", "max_experts"):
            parser.add_argument(flag, type=int, default=default)
        elif isinstance(default, bool):
            parser.add_argument(flag, type=_str2bool, default=default)
        elif isinstance(default, int):
            parser.add_argument(flag, type=int, default=default)
        elif isinstance(default, float):
            parser.add_argument(flag, type=float, default=default)
        else:
            parser.add_argument(flag, type=str, default=default)
    return parser


def explicit_flags(argv: Optional[Sequence[str]] = None) -> set:
    """Names of flags explicitly present on the command line — for the
    few places where 'user typed it' must beat a data-derived value
    (e.g. eval_distilled: an explicit --lr_net overrides the learned LR
    embedded in the npz; the argparse default cannot encode that)."""
    import sys

    toks = list(sys.argv[1:]) if argv is None else list(argv)
    return {t[2:].split("=", 1)[0] for t in toks if t.startswith("--")}


def parse_config(argv: Optional[Sequence[str]] = None,
                 defaults: Optional[Config] = None) -> Config:
    """Parse a reference-style command line into a :class:`Config`.

    Unknown flags are tolerated (reference uses ``parse_known_args`` at
    ``distill.py:680``).
    """
    parser = argparse.ArgumentParser(description="Parameter Processing")
    add_reference_flags(parser, defaults)
    args, unknown = parser.parse_known_args(argv)
    if unknown:
        print("Warning: Ignoring unknown arguments:", unknown)
    kw: Dict[str, Any] = vars(args)
    kw["dsa"] = _str2bool(kw.get("dsa", "True"))
    kw["mesh_shape"] = tuple(int(x) for x in str(kw.get("mesh_shape", "")
                                                 ).split(",") if x.strip())
    kw["mesh_axes"] = tuple(x for x in str(kw.get("mesh_axes", "data")
                                           ).split(",") if x.strip()) or ("data",)
    valid = {f.name for f in dataclasses.fields(Config)}
    return Config(**{k: v for k, v in kw.items() if k in valid})
