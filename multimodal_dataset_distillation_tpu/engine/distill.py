"""Bi-trajectory distillation engine — the heart of the framework.

Reference algorithm (``distill_original.py:413-458`` as semantic spec,
``distill.py:509-613`` as feature superset): per outer iteration, start a
"student" at epoch ``t`` of a random expert trajectory, take ``syn_steps``
SGD steps on minibatches of the synthetic data with gradients kept in the
graph, and minimize

    grand_loss =   ||theta_student - theta*||^2 / ||theta_t - theta*||^2   (image)
                 + ||theta_student - theta*||^2 / ||theta_t - theta*||^2   (text)

backpropagated through the whole unrolled inner optimization into the
synthetic pixels, synthetic text embeddings, and the two learnable inner
LRs, then step three outer SGD(momentum=0.5) optimizers
(``distill_original.py:155-165``).

TPU-native design: the student is just a flat vector (``ravel_pytree``) —
what ``ReparamModule`` (reparam_module.py) fakes, JAX does natively.  The
unroll is one ``lax.scan`` with per-step ``jax.checkpoint`` (the
reference's CUDA-OOM guards, ``distill.py:522-575``, become a remat
policy), and the meta-gradient is a single ``jax.grad`` over
``(image_syn, text_syn, lr_img, lr_txt)`` instead of
``create_graph=True`` + ``backward``.  Everything—both towers' unrolled
updates and the outer step—is one jitted program per outer iteration;
batches shard over the mesh ``data`` axis and parameter gradients are
``psum``-reduced by XLA.

Inner-loss logit scale conventions (cfg.inner_scale):
  * "fixed":  raw log(1/0.07) (upstream, distill_original.py:103,430)
  * "syn_lr": learnable inner image LR doubles as the scale
    (fork, distill.py:548)
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from multimodal_dataset_distillation_tpu.config import Config
from multimodal_dataset_distillation_tpu.models.clip_model import VLBiEncoder
from multimodal_dataset_distillation_tpu.ops.contrastive import (
    RAW_LOG_SCALE,
    _symmetric_ce as _sym_ce,
)
from multimodal_dataset_distillation_tpu.utils.flat import make_unravel


@flax.struct.dataclass
class DistillState:
    image_syn: jnp.ndarray          # (N, H, W, 3) learned pixels
    text_syn: jnp.ndarray           # (N, text_dim) learned embeddings
    syn_lr_img: jnp.ndarray         # scalar learnable inner LR (image)
    syn_lr_txt: jnp.ndarray         # scalar learnable inner LR (text)
    opt_img: Any
    opt_txt: Any
    opt_lr: Any


class Distiller:
    """Owns the jitted outer step; host code feeds expert segments."""

    def __init__(self, cfg: Config, model: VLBiEncoder,
                 init_variables: Dict,
                 image_syn: np.ndarray, text_syn: np.ndarray,
                 mesh=None):
        self.cfg = cfg
        self.model = model
        self.mesh = mesh  # jax.sharding.Mesh for data-parallel inner batches
        # Non-divisible inner minibatches (e.g. the headline mb=100 on a
        # v5e-8 mesh) are padded to the next multiple of the data axis
        # and masked out of the contrastive loss — the TPU-native match
        # for DataParallel's uneven scatter (distill.py:443-445).  The
        # masked loss is EXACTLY the unpadded loss (pad columns get -inf
        # logits before the softmax, pad rows zero weight), so gradients
        # equal the single-device ones (tests/test_uneven_shard.py).
        self._inner_mb = int(min(cfg.mini_batch_size,
                                 np.asarray(image_syn).shape[0]))
        self._inner_pad = 0
        if mesh is not None and "data" in mesh.axis_names:
            nd = mesh.shape["data"]
            self._inner_pad = (-self._inner_mb) % nd
        params = init_variables["params"]
        self.img_size, self._unravel_img = make_unravel(params["image_encoder"])
        self.txt_size, self._unravel_txt = make_unravel(params["text_projection"])
        # non-param collections (e.g. batch_stats) ride along frozen at init
        self._extra_state = {k: v for k, v in init_variables.items()
                             if k != "params"}

        def tx(lr):
            # --max_grad_norm: optional outer-gradient clipping (0 = off,
            # the reference behavior; its only guard is the NaN bailout)
            sgd = optax.sgd(lr, momentum=0.5)
            if getattr(cfg, "max_grad_norm", 0.0):
                return optax.chain(
                    optax.clip_by_global_norm(cfg.max_grad_norm), sgd)
            return sgd

        self.tx_img = tx(cfg.lr_img)
        self.tx_txt = tx(cfg.lr_txt)
        self.tx_lr = tx(cfg.lr_lr)

        # outer state dtype: f32 unless running the f64 verification mode
        sdt = jnp.float64 if cfg.inner_dtype == "float64" else jnp.float32
        image_syn = jnp.asarray(image_syn, sdt)
        text_syn = jnp.asarray(text_syn, sdt)
        #: logical synthetic-set size; ``state.image_syn`` may carry extra
        #: padding rows below — use :meth:`syn_arrays` for host reads
        self.n_queries = int(image_syn.shape[0])
        self._syn_pad = 0
        # --shard_syn: split the synthetic tensors (and, by donation +
        # sharding propagation, their meta-gradients and momentum buffers)
        # over the mesh "data" axis.  The reference keeps the whole
        # synthetic set replicated per GPU (distill.py:300-311); at
        # num_queries=500 that is a ~300 MB pixel tensor whose per-step
        # meta-gradient scatter dominates the inner step.  Indices remain
        # global, so gradients match the unsharded path exactly.  A query
        # count that does not divide the mesh (the headline nq=100 on a
        # v5e-8) is padded with inert rows: minibatch indices only ever
        # select [0, n_queries), so pad rows receive exactly zero
        # meta-gradient and stay at their init forever.
        self._syn_shardings = None
        if (mesh is not None and getattr(cfg, "shard_syn", False)
                and "data" in mesh.axis_names):
            from jax.sharding import NamedSharding, PartitionSpec as P

            nd = mesh.shape["data"]
            self._syn_pad = (-self.n_queries) % nd
            if self._syn_pad:
                image_syn = jnp.concatenate(
                    [image_syn, jnp.zeros((self._syn_pad,)
                                          + image_syn.shape[1:], sdt)])
                text_syn = jnp.concatenate(
                    [text_syn, jnp.zeros((self._syn_pad,)
                                         + text_syn.shape[1:], sdt)])
            self._syn_shardings = (
                NamedSharding(mesh, P("data", None, None, None)),
                NamedSharding(mesh, P("data", None)))
            image_syn = jax.device_put(image_syn, self._syn_shardings[0])
            text_syn = jax.device_put(text_syn, self._syn_shardings[1])
        self.state = DistillState(
            image_syn=image_syn,
            text_syn=text_syn,
            syn_lr_img=jnp.asarray(cfg.lr_teacher_img, sdt),
            syn_lr_txt=jnp.asarray(cfg.lr_teacher_txt, sdt),
            opt_img=self.tx_img.init(image_syn),
            opt_txt=self.tx_txt.init(text_syn),
            opt_lr=self.tx_lr.init((jnp.asarray(cfg.lr_teacher_img, sdt),
                                    jnp.asarray(cfg.lr_teacher_txt, sdt))),
        )
        if self._syn_shardings is not None:
            # momentum buffers shard with their parameters (zeros_like
            # usually preserves sharding; make it explicit)
            sh_img, sh_txt = self._syn_shardings
            self.state = self.state.replace(
                opt_img=jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, sh_img)
                    if getattr(x, "shape", None) == image_syn.shape else x,
                    self.state.opt_img),
                opt_txt=jax.tree_util.tree_map(
                    lambda x: jax.device_put(x, sh_txt)
                    if getattr(x, "shape", None) == text_syn.shape else x,
                    self.state.opt_txt))
        self._step = self._build_step()
        self.rng = jax.random.PRNGKey(cfg.seed)
        # set by drivers when the NaN bailout fires: the pipelined loop
        # has already dispatched one more step, so state is one step past
        # the NaN and must be treated as invalid when this is not None
        self.nan_bailout_it: Optional[int] = None

    # -- functional towers over param trees ---------------------------------
    #
    # The unroll carries parameter TREES, not flat vectors: the flat
    # buffer-format vectors are unraveled ONCE per outer step (in
    # grand_loss), not per use.  Profiling the flat-carry version showed
    # ~38k device ops per outer step — a storm of per-leaf dynamic-slice
    # DMAs (25k copy-done/step) plus concatenates for the ravel
    # transpose — all of which vanish when the scan carry is the tree.
    # Flat enters/leaves only at the buffer-I/O boundary (SURVEY §2.2
    # row 28 format) and in the trajectory-matching loss, which is
    # computed leaf-wise against the unraveled targets (same sum, exact).

    def _img_forward(self, flat_theta, x, rng, dtype=jnp.float32):
        """Flat-vector convenience wrapper (diagnostics/tests)."""
        return self._img_forward_tree(self._unravel_img(flat_theta), x, rng,
                                      dtype)

    def _txt_forward(self, flat_theta, y, rng, dtype=jnp.float32):
        return self._txt_forward_tree(self._unravel_txt(flat_theta), y, rng,
                                      dtype)

    def _img_forward_tree(self, params, x, rng, dtype=jnp.float32):
        if dtype != jnp.float32:
            # bf16 compute mode: params cast inside the graph, so the
            # gradient w.r.t. the f32 carry flows through the cast and
            # accumulates in f32 (mixed precision a la the fork's AMP
            # epoch, epoch.py:79 — but on the distillation hot path).
            params = jax.tree_util.tree_map(lambda p: p.astype(dtype), params)
        vs = {"params": {"image_encoder": params}, **self._extra_state}
        # students run in train mode (distill.py:446-447) — dropout active
        return self.model.apply(vs, x, train=True, rngs={"dropout": rng},
                                method=VLBiEncoder.encode_image)

    def _txt_forward_tree(self, params, y, rng, dtype=jnp.float32):
        if dtype != jnp.float32:
            params = jax.tree_util.tree_map(lambda p: p.astype(dtype), params)
        vs = {"params": {"text_projection": params}}
        return self.model.apply(vs, y, train=True, rngs={"dropout": rng},
                                method=VLBiEncoder.project_text)

    # -- the jitted outer step ----------------------------------------------

    def _build_step(self):
        cfg = self.cfg
        inner_dtype = {"bfloat16": jnp.bfloat16, "float64": jnp.float64}.get(
            cfg.inner_dtype, jnp.float32)
        # embeddings/logits dtype: never below f32
        out_dtype = jnp.float64 if inner_dtype == jnp.float64 else jnp.float32

        mesh = self.mesh

        def _tmap(f, *ts):
            return jax.tree_util.tree_map(f, *ts)

        def _tvdot(a, b):
            """Sum of per-leaf vdots (== vdot of the ravels)."""
            return sum(jnp.vdot(x, y) for x, y in zip(
                jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))

        # --carry_mode: what the scan carries through the unroll.
        #   "flat" (default): the buffer-format flat vectors; each use
        #     unravels in-graph.  ONE carry buffer per modality lets XLA
        #     alias updates across the fully-unrolled scan — measured
        #     0.856 steps/s @ scan_unroll=8 on v5e-1 (fits in 15.6 GB).
        #   "tree": the param pytree, unraveled once per outer step —
        #     ~38k fewer device ops/step (no per-use slice/concat storm)
        #     and 1.7x faster on small CPU configs, but the 200-leaf
        #     carry defeats XLA's buffer aliasing at high scan_unroll
        #     (unroll=8 needs 20.3 GB -> OOM; unroll<=2 fits but is ~3%
        #     slower than flat@8 on v5e).  Kept for small models and as
        #     the memory-profile-friendly mode.
        # All inner-step code below is carry-agnostic: a flat vector is
        # just a single-leaf pytree to tree_map/tree_leaves.
        carry_tree = getattr(cfg, "carry_mode", "flat") == "tree"

        # non-divisible minibatch padding (see __init__): a static 0/1
        # mask over the padded batch; pad entries replicate index 0 but
        # contribute exactly nothing to the loss or its gradients
        inner_pad = self._inner_pad
        inner_mb = self._inner_mb
        inner_mask = (jnp.concatenate([jnp.ones(inner_mb), jnp.zeros(inner_pad)])
                      if inner_pad else None)

        def closs(thi, tht, x, y, lr_i, ki, kt):
            if carry_tree:
                f = self._img_forward_tree(thi, x, ki,
                                           inner_dtype).astype(out_dtype)
                g = self._txt_forward_tree(tht, y, kt,
                                           inner_dtype).astype(out_dtype)
            else:
                f = self._img_forward(thi, x, ki,
                                      inner_dtype).astype(out_dtype)
                g = self._txt_forward(tht, y, kt,
                                      inner_dtype).astype(out_dtype)
            f = f / jnp.linalg.norm(f, axis=1, keepdims=True)
            g = g / jnp.linalg.norm(g, axis=1, keepdims=True)
            scale = (RAW_LOG_SCALE if cfg.inner_scale == "fixed"
                     else lr_i)
            logits = scale * jnp.dot(f, g.T,
                                     preferred_element_type=out_dtype,
                                     precision=jax.lax.Precision.HIGHEST)
            if inner_mask is None:
                return _sym_ce(logits)
            return _sym_ce(logits, inner_mask.astype(out_dtype), inner_mb)

        # -- hvp_mode="forward": custom-VJP inner update ------------------
        # The meta-backward through  new_th = th - lr * grad(closs)  needs
        # (a) the Hessian action  (d grad/d th)^T ybar  and (b) the mixed
        # term  (d grad/d {x,y,lr})^T ybar.  JAX's default is reverse-over-
        # reverse: remat the fwd+bwd, then VJP through both (~9 forward-
        # equivalents per inner step in the backward).  Both terms are
        # instead gradients of ONE scalar — the directional derivative
        #   h = d/de closs(th + e*v, ...)  at  v = lr*ybar
        # (symmetry of second derivatives) — so reverse-over-FORWARD gets
        # everything in one grad-of-jvp (~4-5 forward-equivalents), and
        # the saved inner gradient supplies <g, ybar> for the lr
        # cotangent.  No remat needed: residuals are just (th, g, x, y)
        # per step.  Exact same math — pinned by the float64 finite-
        # difference tests and the torch step-parity harness.
        import numpy as _np

        def _float0_zeros(k):
            return _np.zeros(_np.shape(k), dtype=jax.dtypes.float0)

        # --fr_remat: remat policy on the inner loss for BOTH fr uses
        # (the fwd grad and the bwd grad-of-jvp).  Replay is bit-exact —
        # this only changes what XLA keeps live, trading ~1 extra
        # forward-equivalent of recompute per inner step for a much
        # smaller activation footprint (the 15.6 GB temps / spill-DMA
        # lever, DESIGN.md §10).
        _fr_policies = {
            "none": "off",
            "full": None,  # save nothing, replay everything
            "names": jax.checkpoint_policies.save_only_these_names(
                "nf_stem_out",
                *[f"nf_stage{s}_block{b}_out"
                  for s, d in ((0, 4), (1, 8), (2, 12), (3, 12))
                  for b in range(d)]),
            "dots_no_batch":
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        }
        _frr = getattr(cfg, "fr_remat", "none")
        if _frr == "names" and not str(
                getattr(cfg, "image_encoder", "")).startswith(
                    ("nfnet", "nf_")):
            # the name tags live in models/nfnet.py only; for untagged
            # encoders save_only_these_names matches nothing and the
            # "middle-ground" knob silently degrades to full replay
            import warnings

            warnings.warn(
                f"--fr_remat=names saves NF checkpoint_name tags, but "
                f"image_encoder={cfg.image_encoder!r} has none — the "
                f"policy degrades to 'full' (save nothing, replay all)",
                stacklevel=2)
        if _fr_policies.get(_frr, "off") != "off":
            closs_fr = jax.checkpoint(closs, policy=_fr_policies[_frr],
                                      prevent_cse=False)
        else:
            closs_fr = closs

        # --fr_resid_dtype="inner": store the big per-step residuals
        # (theta, g per modality) in inner_dtype.  theta is EXACT: the
        # fwd computed with cast(theta_f32) and the bwd re-upcasts the
        # stored bf16 to that identical cast point before closs re-casts
        # it.  g only feeds the scalar <g, ybar> inner-LR cotangent
        # (f32-accumulated vdot of bf16 operands, ~1e-3 relative).
        _resid_dt = (inner_dtype
                     if getattr(cfg, "fr_resid_dtype", "carry") == "inner"
                     and inner_dtype != jnp.float64 else None)

        def _resid_pack(t):
            return _tmap(lambda p: p.astype(_resid_dt), t) if _resid_dt else t

        def _resid_unpack(t, dt):
            return _tmap(lambda p: p.astype(dt), t) if _resid_dt else t

        @jax.custom_vjp
        def fr_core(lr_i, lr_t, x, y, thi, tht, ki, kt):
            gi, gt = jax.grad(closs_fr, argnums=(0, 1))(
                thi, tht, x, y, lr_i, ki, kt)
            return (_tmap(lambda p, g: p - lr_i * g, thi, gi),
                    _tmap(lambda p, g: p - lr_t * g, tht, gt))

        def fr_core_fwd(lr_i, lr_t, x, y, thi, tht, ki, kt):
            gi, gt = jax.grad(closs_fr, argnums=(0, 1))(
                thi, tht, x, y, lr_i, ki, kt)
            out = (_tmap(lambda p, g: p - lr_i * g, thi, gi),
                   _tmap(lambda p, g: p - lr_t * g, tht, gt))
            return out, (lr_i, lr_t, x, y, _resid_pack(thi), _resid_pack(tht),
                         ki, kt, _resid_pack(gi), _resid_pack(gt))

        # --fr_bwd: orientation of the second-order transform in the
        # custom-VJP backward.  Both compute the identical quantities —
        # the Hessian actions and mixed terms are second derivatives of
        # one scalar, symmetric in differentiation order:
        #   "rof" (reverse-over-forward): grad of the directional
        #     derivative h = d/de closs(th + e*v).  The grad retains the
        #     whole doubled (primal+tangent) activation graph before
        #     transposing it — the 4-deep transpose(jvp(...)) nesting
        #     that sets the 15.6 GB temp peak (DESIGN.md §10).
        #   "for" (forward-over-reverse): jvp THROUGH grad(closs).
        #     Forward-mode adds no second retained graph — tangents
        #     stream in lockstep with the (fwd+bwd) primal — so the peak
        #     is ~the plain gradient's.  x/y/lr tangents are literal
        #     zeros, which XLA's algebraic simplifier folds away.
        fr_bwd_mode = getattr(cfg, "fr_bwd", "rof")
        # --fused_jvp: while tracing the inner jvp of the rof backward,
        # WSConv routes through the merged-tangent conv rule
        # (ops/fused_jvp.py): the share-x {primal, weight-tangent} conv
        # pair becomes ONE conv with per-group doubled output channels —
        # fewer activation reads in the tangent forward AND its
        # transpose, and 128-wide grouped convs on the 128-lane MXU.
        # rof-only: the merged rule needs concrete tangents (plain
        # linearize through it cannot separate the primal — see module
        # docstring), which "for" mode's jvp-through-grad does not give
        # at the conv sites.
        from ..ops import fused_jvp as _fjvp
        use_fused_jvp = _fjvp.resolve(cfg) and fr_bwd_mode == "rof"

        def fr_core_bwd(res, cot):
            lr_i, lr_t, x, y, thi, tht, ki, kt, gi, gt = res
            ybi, ybt = cot
            cdt = jax.tree_util.tree_leaves(ybi)[0].dtype  # carry dtype
            thi = _resid_unpack(thi, cdt)
            tht = _resid_unpack(tht, cdt)
            vi = _tmap(lambda b: lr_i * b, ybi)
            vt = _tmap(lambda b: lr_t * b, ybt)

            if fr_bwd_mode == "for":
                def grad_all(thi_, tht_, x_, y_, lr_i_):
                    return jax.grad(closs_fr, argnums=(0, 1, 2, 3, 4))(
                        thi_, tht_, x_, y_, lr_i_, ki, kt)

                _, tang = jax.jvp(
                    grad_all, (thi, tht, x, y, lr_i),
                    (vi, vt, jnp.zeros_like(x), jnp.zeros_like(y),
                     jnp.zeros_like(lr_i)))
                hgi, hgt, hx, hy, hlr = tang
            else:
                def h_fn(thi_, tht_, x_, y_, lr_i_):
                    # tangents only on (thi, tht): x/y/lr ride in by
                    # closure, so no zero-tangent JVP is propagated
                    # through the towers
                    with _fjvp.activate(use_fused_jvp):
                        _, dh = jax.jvp(
                            lambda a, b: closs_fr(a, b, x_, y_, lr_i_,
                                                  ki, kt),
                            (thi_, tht_), (vi, vt))
                    return dh

                hgi, hgt, hx, hy, hlr = jax.grad(
                    h_fn, argnums=(0, 1, 2, 3, 4))(thi, tht, x, y, lr_i)
            dthi = _tmap(lambda b, h: b - h, ybi, hgi)
            dtht = _tmap(lambda b, h: b - h, ybt, hgt)
            dx = -hx
            dy = -hy
            dlr_i = -_tvdot(gi, ybi) - hlr
            dlr_t = -_tvdot(gt, ybt)
            return (dlr_i, dlr_t, dx, dy, dthi, dtht,
                    _float0_zeros(ki), _float0_zeros(kt))

        fr_core.defvjp(fr_core_fwd, fr_core_bwd)
        use_fr = getattr(cfg, "hvp_mode", "reverse") == "forward"

        def inner_step(lr_i, lr_t, image_syn, text_syn, carry, inp):
            thi, tht = carry
            idx, key = inp
            x = image_syn[idx].astype(inner_dtype)
            y = text_syn[idx].astype(inner_dtype)
            if mesh is not None and "data" in mesh.axis_names:
                # DataParallel semantics (buffer.py:51-53 / distill.py:443-445
                # in TPU form): minibatch sharded over the mesh data axis,
                # flat params replicated; XLA psums the param grads over ICI.
                from jax.sharding import NamedSharding, PartitionSpec as P

                x = jax.lax.with_sharding_constraint(
                    x, NamedSharding(mesh, P("data", None, None, None)))
                y = jax.lax.with_sharding_constraint(
                    y, NamedSharding(mesh, P("data", None)))
            ki, kt = jax.random.split(key)

            if use_fr:
                new_i, new_t = fr_core(lr_i, lr_t, x, y, thi, tht, ki, kt)
                return (new_i, new_t), None
            gi, gt = jax.grad(closs, argnums=(0, 1))(
                thi, tht, x, y, lr_i, ki, kt)
            new_i = _tmap(lambda p, g: p - lr_i * g, thi, gi)
            new_t = _tmap(lambda p, g: p - lr_t * g, tht, gt)
            return (new_i, new_t), None

        # remat configuration. prevent_cse=False is safe (and recommended)
        # under lax.scan — the scan boundary already provides the barrier
        # jax.checkpoint's CSE-prevention exists for — and lets XLA fuse
        # the recomputation with the backward pass. Policies trade memory
        # for less recompute: "dots" saves matmul/conv results so the
        # backward does not re-run them.
        _policies = {
            "none": None,
            "dots": jax.checkpoint_policies.dots_saveable,
            "dots_no_batch":
                jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        }
        ckpt = functools.partial(
            jax.checkpoint,
            prevent_cse=bool(getattr(cfg, "remat_prevent_cse", True)),
            policy=_policies[getattr(cfg, "remat_policy", "none")])

        # hvp_mode="forward" replaces remat: the custom VJP saves small
        # residuals (th, g, x, y) per step and never replays the fwd+bwd
        remat_on = cfg.remat_inner and not use_fr

        def _tree_mse(a_tree, b_tree, dt):
            """sum((ravel(a) - ravel(b))**2), computed leaf-wise."""
            return sum(jnp.sum((x.astype(dt) - y.astype(dt)) ** 2)
                       for x, y in zip(jax.tree_util.tree_leaves(a_tree),
                                       jax.tree_util.tree_leaves(b_tree)))

        def grand_loss(image_syn, text_syn, lr_i, lr_t,
                       img_th0, txt_th0, img_tgt, txt_tgt, idx_seq, keys):
            if inner_pad and idx_seq.shape[1] == inner_mb:
                # pad minibatch indices to the mesh multiple; pad slots
                # repeat index 0 and are masked out of the loss
                idx_seq = jnp.concatenate(
                    [idx_seq, jnp.broadcast_to(
                        idx_seq[:, :1], (idx_seq.shape[0], inner_pad))],
                    axis=1)
            # tree mode: flat buffer-format vectors -> trees ONCE here
            ti0 = self._unravel_img(img_th0) if carry_tree else img_th0
            tt0 = self._unravel_txt(txt_th0) if carry_tree else txt_th0
            f = functools.partial(inner_step, lr_i, lr_t, image_syn, text_syn)
            g = max(1, int(getattr(cfg, "remat_group", 1)))
            if remat_on and g > 1 and idx_seq.shape[0] % g == 0:
                # grouped remat: checkpoint every g inner steps — live
                # activations for g steps, recompute 1 extra fwd per g
                # steps instead of per step (memory <-> recompute dial)
                n = idx_seq.shape[0] // g

                def group(carry, inp):
                    gi, gk = inp
                    out, _ = jax.lax.scan(f, carry, (gi, gk))
                    return out, None

                (thiF, thtF), _ = jax.lax.scan(
                    ckpt(group), (ti0, tt0),
                    (idx_seq.reshape(n, g, -1),
                     keys.reshape(n, g, *keys.shape[1:])))
            else:
                if remat_on:
                    f = ckpt(f)
                (thiF, thtF), _ = jax.lax.scan(
                    f, (ti0, tt0), (idx_seq, keys),
                    unroll=max(1, int(getattr(cfg, "scan_unroll", 1))))
            tgt_i = self._unravel_img(img_tgt) if carry_tree else img_tgt
            tgt_t = self._unravel_txt(txt_tgt) if carry_tree else txt_tgt
            dt_i = img_tgt.dtype
            dt_t = txt_tgt.dtype
            img_loss = (_tree_mse(thiF, tgt_i, dt_i)
                        / _tree_mse(ti0, tgt_i, dt_i))
            txt_loss = (_tree_mse(thtF, tgt_t, dt_t)
                        / _tree_mse(tt0, tgt_t, dt_t))
            return img_loss + txt_loss, (img_loss, txt_loss)

        tx_img, tx_txt, tx_lr = self.tx_img, self.tx_txt, self.tx_lr
        # exposed for gradient-correctness tests (finite differences)
        self.grand_loss = grand_loss

        def unroll(image_syn, text_syn, lr_i, lr_t, img_th0, txt_th0,
                   idx_seq, keys):
            """Diagnostic: the same inner unroll, returning EVERY per-step
            student parameter vector (syn_steps, P) flat — used by the
            reference-parity harness to compare step-for-step against the
            torch ReparamModule loop (distill_original.py:413-437)."""
            from jax.flatten_util import ravel_pytree

            if inner_pad and idx_seq.shape[1] == inner_mb:
                # same pad-and-mask as grand_loss: closs' mask width is
                # the padded minibatch
                idx_seq = jnp.concatenate(
                    [idx_seq, jnp.broadcast_to(
                        idx_seq[:, :1], (idx_seq.shape[0], inner_pad))],
                    axis=1)
            f = functools.partial(inner_step, lr_i, lr_t, image_syn, text_syn)

            def collect(carry, inp):
                out, _ = f(carry, inp)
                if carry_tree:
                    return out, (ravel_pytree(out[0])[0],
                                 ravel_pytree(out[1])[0])
                return out, out

            c0 = ((self._unravel_img(img_th0), self._unravel_txt(txt_th0))
                  if carry_tree else (img_th0, txt_th0))
            _, (his, hts) = jax.lax.scan(collect, c0, (idx_seq, keys))
            return his, hts

        self.unroll = unroll

        syn_shardings = self._syn_shardings

        def outer_update(state, img_th0, txt_th0, img_tgt, txt_tgt,
                         idx_seq, keys):
            if syn_shardings is not None:
                # pin the synthetic tensors (and hence their meta-
                # gradients and updates) to the query-sharded layout so
                # XLA cannot silently replicate the 300 MB pixel state
                state = state.replace(
                    image_syn=jax.lax.with_sharding_constraint(
                        state.image_syn, syn_shardings[0]),
                    text_syn=jax.lax.with_sharding_constraint(
                        state.text_syn, syn_shardings[1]))
            (loss, (img_loss, txt_loss)), grads = jax.value_and_grad(
                grand_loss, argnums=(0, 1, 2, 3), has_aux=True)(
                    state.image_syn, state.text_syn,
                    state.syn_lr_img, state.syn_lr_txt,
                    img_th0, txt_th0, img_tgt, txt_tgt, idx_seq, keys)
            g_img, g_txt, g_li, g_lt = grads

            # --image_only/--text_only: freeze the other modality
            # (distill_original.py:578-579, dead there, functional here)
            if getattr(cfg, "text_only", False):
                g_img = jnp.zeros_like(g_img)
                g_li = jnp.zeros_like(g_li)
            if getattr(cfg, "image_only", False):
                g_txt = jnp.zeros_like(g_txt)
                g_lt = jnp.zeros_like(g_lt)
            upd_img, opt_img = tx_img.update(g_img, state.opt_img,
                                             state.image_syn)
            upd_txt, opt_txt = tx_txt.update(g_txt, state.opt_txt,
                                             state.text_syn)
            upd_lr, opt_lr = tx_lr.update((g_li, g_lt), state.opt_lr,
                                          (state.syn_lr_img,
                                           state.syn_lr_txt))
            new_img = optax.apply_updates(state.image_syn, upd_img)
            new_txt = optax.apply_updates(state.text_syn, upd_txt)
            if syn_shardings is not None:
                new_img = jax.lax.with_sharding_constraint(
                    new_img, syn_shardings[0])
                new_txt = jax.lax.with_sharding_constraint(
                    new_txt, syn_shardings[1])
            new_state = DistillState(
                image_syn=new_img,
                text_syn=new_txt,
                syn_lr_img=optax.apply_updates(state.syn_lr_img, upd_lr[0]),
                syn_lr_txt=optax.apply_updates(state.syn_lr_txt, upd_lr[1]),
                opt_img=opt_img, opt_txt=opt_txt, opt_lr=opt_lr)
            metrics = {"grand_loss": loss, "img_param_loss": img_loss,
                       "txt_param_loss": txt_loss,
                       "syn_lr_img_grad": g_li, "syn_lr_txt_grad": g_lt,
                       # PRE-step LR values — what the reference logs each
                       # iteration (it reads syn_lr before optimizer.step,
                       # distill.py:432-436)
                       "syn_lr_img_pre": state.syn_lr_img,
                       "syn_lr_txt_pre": state.syn_lr_txt,
                       # post-step LR values, exposed here so the driver
                       # loop can read everything host-side from the
                       # (non-donated) metrics of the PREVIOUS step and
                       # keep the device pipeline full (the state itself
                       # is donated and must not be read mid-flight)
                       "syn_lr_img": new_state.syn_lr_img,
                       "syn_lr_txt": new_state.syn_lr_txt}
            return new_state, metrics

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state: DistillState, img_th0, txt_th0, img_tgt, txt_tgt,
                 idx_seq, rng):
            keys = jax.random.split(rng, idx_seq.shape[0])
            return outer_update(state, img_th0, txt_th0, img_tgt, txt_tgt,
                                idx_seq, keys)

        expert_epochs = cfg.expert_epochs

        @functools.partial(jax.jit, donate_argnums=(0,))
        def step_traj(state: DistillState, traj_img, traj_txt, start,
                      idx_seq, rng):
            """Device-resident expert segment: slice theta_0/theta* out of
            the full (T, P) trajectories in HBM instead of uploading
            ~160 MB of flat parameters from host every outer iteration
            (the reference re-flattens expert params to GPU per iteration,
            distill.py:471-476 — on TPU the whole buffer lives in HBM)."""
            keys = jax.random.split(rng, idx_seq.shape[0])
            img_th0 = jax.lax.dynamic_index_in_dim(traj_img, start, 0,
                                                   keepdims=False)
            txt_th0 = jax.lax.dynamic_index_in_dim(traj_txt, start, 0,
                                                   keepdims=False)
            img_tgt = jax.lax.dynamic_index_in_dim(traj_img,
                                                   start + expert_epochs, 0,
                                                   keepdims=False)
            txt_tgt = jax.lax.dynamic_index_in_dim(traj_txt,
                                                   start + expert_epochs, 0,
                                                   keepdims=False)
            return outer_update(state, img_th0, txt_th0, img_tgt, txt_tgt,
                                idx_seq, keys)

        self._step_traj = step_traj
        return step

    # -- host-side driver -----------------------------------------------------

    def sample_indices(self, rng: np.random.RandomState) -> np.ndarray:
        """(syn_steps, mini_batch_size) minibatch indices; per step a fresh
        randperm prefix (distill_original.py:414-416).  Indices cover the
        LOGICAL query set only; mesh padding happens inside the step."""
        n = self.n_queries
        m = min(self.cfg.mini_batch_size, n)
        return np.stack([rng.permutation(n)[:m]
                         for _ in range(self.cfg.syn_steps)])

    def syn_arrays(self) -> Tuple[np.ndarray, np.ndarray]:
        """(image_syn, text_syn) host copies, mesh padding stripped — the
        arrays eval/visualization/save must use."""
        return (np.asarray(self.state.image_syn)[:self.n_queries],
                np.asarray(self.state.text_syn)[:self.n_queries])

    def step(self, img_th0: np.ndarray, txt_th0: np.ndarray,
             img_tgt: np.ndarray, txt_tgt: np.ndarray,
             idx_seq: np.ndarray) -> Dict[str, float]:
        self.rng, sub = jax.random.split(self.rng)
        self.state, metrics = self._step(
            self.state, jnp.asarray(img_th0), jnp.asarray(txt_th0),
            jnp.asarray(img_tgt), jnp.asarray(txt_tgt),
            jnp.asarray(idx_seq), sub)
        return metrics

    def step_traj(self, traj_img, traj_txt, start: int,
                  idx_seq: np.ndarray) -> Dict[str, float]:
        """Outer step with HBM-resident expert trajectories (fast path).

        ``traj_img``/``traj_txt`` are (T, P) device arrays (put once via
        :meth:`put_trajectory`); only ``start`` and the minibatch indices
        cross the host->device boundary per iteration.
        """
        self.rng, sub = jax.random.split(self.rng)
        self.state, metrics = self._step_traj(
            self.state, traj_img, traj_txt, np.int32(start),
            jnp.asarray(idx_seq), sub)
        return metrics

    @staticmethod
    def put_trajectory(traj: np.ndarray) -> jnp.ndarray:
        """Host (T, P) float32 stacked trajectory -> device array."""
        return jax.device_put(jnp.asarray(traj, jnp.float32))


# ---------------------------------------------------------------------------
# expert buffer cycling (distill.py:450-476, distill_original.py:186-196)
# ---------------------------------------------------------------------------

class ExpertCycler:
    """Shuffle buffer files, walk trajectories, sample start epochs."""

    def __init__(self, img_files: Sequence[str], txt_files: Sequence[str],
                 max_start_epoch: int, expert_epochs: int,
                 max_files: Optional[int] = None, seed: int = 0,
                 load_all: bool = False, max_experts: Optional[int] = None,
                 device_cache_cap: int = 4, prefetch: bool = True,
                 codecs: Tuple[Any, Any] = (None, None)):
        from multimodal_dataset_distillation_tpu.engine.buffer_io import load_buffer

        # torch-order codecs (models/torch_order.py): identify + convert
        # reference-written `.pt` snapshots (module.parameters() order,
        # torch layouts, buffer.py:94-95) into this framework's ravel
        # order; None = only native-order files are readable from .pt
        self.img_codec, self.txt_codec = codecs
        self._load = load_buffer
        self.rng = np.random.RandomState(seed)
        if max_files:
            img_files = list(img_files)[:max_files]
            txt_files = list(txt_files)[:max_files]
        self.img_files = list(img_files)
        self.txt_files = list(txt_files)
        if not self.img_files:
            raise AssertionError("No buffers detected")
        self.max_start_epoch = max_start_epoch
        self.expert_epochs = expert_epochs
        self.max_experts = max_experts
        # --load_all (distill.py flag): hold every buffer file in host RAM
        # and keep device copies cached across file switches
        self.load_all = load_all
        self._all: Optional[List[Tuple[List, List]]] = None
        if load_all:
            self._all = [(self._trim(self._load(i, self.img_codec)),
                          self._trim(self._load(t, self.txt_codec)))
                         for i, t in zip(self.img_files, self.txt_files)]
        # bounded cache of device trajectory copies: one NFNet-L0
        # trajectory is ~(T, 35M) f32 = GBs in HBM, so caching every
        # --load_all file's copies would OOM next to the 15+ GB step
        # temps.  The access pattern is CYCLIC (_advance moves to the
        # next (file, expert) every call), for which LRU is the worst
        # possible policy once total trajectories > cap (every access a
        # miss -> a multi-GB device_put per outer step).  Eviction is
        # therefore MRU-excluding-newest: the first cap-1 trajectories
        # stay pinned and one slot rotates, giving a (cap-1)/N hit rate
        # for N>cap in rotation (Belady-optimal for a cyclic scan) and
        # full hits when N<=cap.  ``device_cache_cap`` (--traj_cache_cap)
        # sizes it; <=0 disables caching entirely.  With prefetch on
        # (below), one slot is reserved for the in-flight transfer, so
        # cap-2 stay pinned — the misses that remain no longer stall the
        # step loop, which dominates the extra miss.
        from collections import OrderedDict

        self._device_cache: "OrderedDict[Any, Tuple[Any, Any]]" = OrderedDict()
        self._device_cache_cap = device_cache_cap
        # one-step-lookahead prefetch (--traj_prefetch): once _advance has
        # moved the cursors, (file_idx, expert_idx) IS the next trajectory,
        # so its device_put can start on a worker thread while the current
        # outer step runs.  At reference scale (20-100 experts rotating
        # through a 4-slot cache, distill.py:450-465) every rotation miss
        # otherwise pays a synchronous multi-hundred-MB host->device
        # transfer inside the step loop.  The budget below keeps
        # cache + in-flight <= cap, so HBM use never exceeds the cap the
        # user sized.  No-op when every trajectory fits (N <= cap).
        self._pending: Dict[Any, Any] = {}
        self._prefetch_pool = None
        if prefetch and device_cache_cap >= 2:
            import concurrent.futures as _cf

            self._prefetch_pool = _cf.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="traj_prefetch")
        self._shuffle()
        self.file_idx = 0
        self.expert_idx = 0
        self._load_current()

    def _trim(self, buf: List) -> List:
        """--max_experts: cap trajectories per file (distill.py:258-260)."""
        return buf[: self.max_experts] if self.max_experts else buf

    def _shuffle(self):
        """shuffle_files (distill.py:79-87): same permutation both lists."""
        perm = self.rng.permutation(len(self.img_files))
        self.img_files = [self.img_files[i] for i in perm]
        self.txt_files = [self.txt_files[i] for i in perm]
        if self._all is not None:
            self._all = [self._all[i] for i in perm]

    def _load_current(self):
        if self._all is not None:
            self.img_buffer, self.txt_buffer = self._all[self.file_idx]
            return  # device copies stay cached (host arrays are stable)
        self.img_buffer = self._trim(self._load(self.img_files[self.file_idx],
                                                self.img_codec))
        self.txt_buffer = self._trim(self._load(self.txt_files[self.file_idx],
                                                self.txt_codec))
        # drop device copies of the previous file's trajectories
        self._device_cache.clear()

    def _advance(self) -> Tuple[np.ndarray, np.ndarray, int]:
        """-> (img_traj (T,P), txt_traj (T,Pt), start_epoch); walks the
        expert/file cursors exactly like distill.py:450-465."""
        img_traj = self.img_buffer[self.expert_idx]
        txt_traj = self.txt_buffer[self.expert_idx]
        # stable identity of the trajectory just read, for the device cache
        # (filename + index within file; id() would be one GC away from
        # silent wrong-trajectory reuse)
        self._last_key = (self.img_files[self.file_idx], self.expert_idx)
        self.expert_idx += 1
        if self.expert_idx == len(self.img_buffer):
            self.expert_idx = 0
            self.file_idx += 1
            if self.file_idx == len(self.img_files):
                self.file_idx = 0
                self._shuffle()
            if len(self.img_files) > 1:
                self._load_current()

        hi = max(1, min(self.max_start_epoch,
                        len(img_traj) - self.expert_epochs))
        start = int(self.rng.randint(0, hi))
        return img_traj, txt_traj, start

    def next_segment(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray,
                                    np.ndarray, int]:
        """-> (img_theta0, txt_theta0, img_target, txt_target, start_epoch)."""
        img_traj, txt_traj, start = self._advance()
        tgt = start + self.expert_epochs
        return (img_traj[start], txt_traj[start],
                img_traj[tgt], txt_traj[tgt], start)

    def next_segment_device(self) -> Tuple[Any, Any, int]:
        """-> (device img_traj, device txt_traj, start_epoch).

        Trajectories are device_put once per (file, expert) and cached, so
        repeated passes over the same buffers (the common case: Iteration
        >> num_experts) transfer nothing — theta_0/theta* are sliced out
        of HBM inside the jitted step.
        """
        import jax as _jax
        import jax.numpy as _jnp

        img_traj, txt_traj, start = self._advance()
        key = self._last_key
        if self._device_cache_cap <= 0:
            return (_jax.device_put(_jnp.asarray(img_traj, _jnp.float32)),
                    _jax.device_put(_jnp.asarray(txt_traj, _jnp.float32)),
                    start)
        # reap stale prefetches first: any pending entry for a key other
        # than the one being served has no consumer (cursors moved without
        # us — e.g. a checkpoint restore, or interleaved next_segment()
        # calls) and would otherwise pin GBs of device memory and one
        # cache-budget slot forever
        for stale in [k for k in self._pending if k != key]:
            self._pending.pop(stale)
        hit = self._device_cache.get(key)
        if hit is None:
            fut = self._pending.pop(key, None)
            if fut is not None:
                hit = fut.result()  # transfer overlapped the last step
            else:
                hit = (_jax.device_put(_jnp.asarray(img_traj, _jnp.float32)),
                       _jax.device_put(_jnp.asarray(txt_traj, _jnp.float32)))
            self._device_cache[key] = hit
            while len(self._device_cache) > self._device_cache_cap:
                # evict the most-recent entry EXCLUDING the one just
                # inserted (see cache-policy comment in __init__)
                victims = [k for k in self._device_cache if k != key]
                self._device_cache.pop(victims[-1])
        self._maybe_prefetch(key)
        return hit[0], hit[1], start

    def _maybe_prefetch(self, current_key) -> None:
        """Start the NEXT trajectory's host->device transfer on the worker
        thread (see the __init__ comment).  Cursor state after _advance
        already points at the next (file, expert); its host buffer is
        loaded.  Keeps len(cache) + len(pending) <= cap, never evicting
        the in-use or incoming entry; skips (rather than over-commits)
        when no safe victim exists."""
        if self._prefetch_pool is None:
            return
        nxt = (self.img_files[self.file_idx], self.expert_idx)
        if nxt in self._device_cache or nxt in self._pending:
            return
        img = self.img_buffer[self.expert_idx]
        txt = self.txt_buffer[self.expert_idx]
        while (len(self._device_cache) + len(self._pending)
               >= self._device_cache_cap):
            victims = [k for k in self._device_cache
                       if k not in (current_key, nxt)]
            if not victims:
                return
            self._device_cache.pop(victims[-1])

        def put():
            import jax as _jax
            import jax.numpy as _jnp

            return (_jax.device_put(_jnp.asarray(img, _jnp.float32)),
                    _jax.device_put(_jnp.asarray(txt, _jnp.float32)))

        self._pending[nxt] = self._prefetch_pool.submit(put)

    def close(self) -> None:
        """Drop in-flight prefetches and stop the worker thread."""
        self._pending.clear()
        if self._prefetch_pool is not None:
            self._prefetch_pool.shutdown(wait=False)
            self._prefetch_pool = None

    def __del__(self):  # best-effort: frees the worker on GC
        try:
            self.close()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# synthetic-data initialization (distill_original.py:65-86,138-148)
# ---------------------------------------------------------------------------

def get_images_texts(n: int, dataset, text_encoder,
                     rng: Optional[np.random.RandomState] = None,
                     num_workers: int = 0) -> Tuple[np.ndarray, np.ndarray]:
    """Sample n random (transformed image, caption CLS embedding) pairs.

    The reference indexes ``dataset[i]`` TWICE per pair — image then
    caption (distill.py:97-105); here each item is fetched once, which
    alone roughly halves init time at nq=500-1000.

    Augment draws use a per-item seeded thread-local RNG
    (``utils/augrng``, seeds drawn from ``rng``), so the resulting
    ``image_syn`` init — the trainable state of the whole run — is
    bit-reproducible for a fixed seed regardless of prior global-stream
    consumption AND of the fetch schedule; ``num_workers>0`` opts into
    a thread pool (decode releases the GIL in both the C++ fastimage
    path and PIL) with identical results.
    """
    from multimodal_dataset_distillation_tpu.utils import augrng

    rng = rng or np.random
    idx = rng.permutation(len(dataset))[:n]
    seeds = rng.randint(0, 2**31 - 1, size=len(idx))

    def fetch(args):
        i, s = args
        augrng.seed_item(s)
        try:
            return dataset[int(i)]
        finally:
            augrng.clear()

    if num_workers > 0:
        import concurrent.futures as cf

        with cf.ThreadPoolExecutor(max_workers=num_workers) as ex:
            items = list(ex.map(fetch, zip(idx, seeds)))
    else:
        items = [fetch(a) for a in zip(idx, seeds)]
    images = np.stack([it[0] for it in items])
    captions = [it[1] for it in items]
    texts = text_encoder.encode(captions)
    return images.astype(np.float32), texts.astype(np.float32)


# per-channel stats of CLIP-normalized natural images
# (distill_original.py:139-144)
PIX_NOISE_MEAN = np.array([-0.0626, -0.0221, 0.0680], np.float32)
PIX_NOISE_STD = np.array([1.0451, 1.0752, 1.0539], np.float32)
TXT_NOISE_MEAN, TXT_NOISE_STD = -0.0094, 0.5253


def noise_images(n: int, image_size: int,
                 rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    rng = rng or np.random
    x = rng.randn(n, image_size, image_size, 3).astype(np.float32)
    return x * PIX_NOISE_STD + PIX_NOISE_MEAN


def noise_texts(n: int, dim: int = 768,
                rng: Optional[np.random.RandomState] = None) -> np.ndarray:
    rng = rng or np.random
    return (rng.randn(n, dim) * TXT_NOISE_STD + TXT_NOISE_MEAN).astype(np.float32)


def dummy_trajectory(snapshot_params, copies: int = 2,
                     rng: Optional[np.random.RandomState] = None) -> List:
    """Dummy-buffer bootstrap (distill.py:262-274): fabricate a trajectory
    from a fresh init so distillation can run without phase 1.

    Unlike the reference (whose dummy path saves a single-snapshot,
    wrongly-nested container that the loader then mis-indexes), successive
    snapshots get a small random perturbation: identical start/target
    parameters would make the normalized trajectory loss 0/0 -> inf and
    trip the NaN bailout on iteration 0, defeating the bootstrap.
    """
    rng = rng or np.random.RandomState(0)
    out = [snapshot_params]
    for _ in range(copies - 1):
        prev = out[-1]
        out.append(jax.tree_util.tree_map(
            lambda x: np.asarray(x) + 1e-3 * rng.randn(*np.shape(x)).astype(
                np.asarray(x).dtype) if np.ndim(x) else x, prev))
    return out
