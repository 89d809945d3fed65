"""timm <-> Flax NFNet weight mapping round trip (networks.py:666-672).

Without network access there are no real timm checkpoints; the round trip
(our params -> timm-named state dict -> import -> identical tree) verifies
naming coverage and every transposition in both directions.
"""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_dataset_distillation_tpu.models.import_torch import (
    load_image_tower_weights,
    nfnet_params_from_timm,
    nfnet_params_to_timm,
)
from multimodal_dataset_distillation_tpu.models.nfnet import nfnet_l0


def _flat(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + k + "/"))
        else:
            out[prefix + k] = np.asarray(v)
    return out


def test_nfnet_l0_roundtrip():
    m = nfnet_l0(num_classes=0)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    params = jax.tree_util.tree_map(np.asarray, v["params"])
    # randomize so transposition bugs can't hide in symmetric tensors
    rng = np.random.RandomState(0)
    params = jax.tree_util.tree_map(
        lambda x: np.asarray(rng.randn(*x.shape), np.float32), params)

    sd = nfnet_params_to_timm(params)
    # timm layout sanity
    assert "stem.conv1.weight" in sd and sd["stem.conv1.weight"].ndim == 4
    assert "stages.0.0.skipinit_gain" in sd
    assert "stages.2.3.conv2b.weight" in sd
    assert "stages.0.0.attn_last.fc1.weight" in sd
    assert sd["stages.0.0.attn_last.fc1.weight"].ndim == 4

    back = nfnet_params_from_timm(sd)
    a, b = _flat(params), _flat(back)
    assert set(a) == set(b), set(a) ^ set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_load_image_tower_weights_replaces_backbone():
    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.expert import (
        init_bi_encoder,
    )
    from multimodal_dataset_distillation_tpu.models.clip_model import (
        build_bi_encoder,
    )

    cfg = Config(image_encoder="nfnet", image_size=64,
                 text_encoder_config="tiny")
    model = build_bi_encoder(cfg)
    variables = init_bi_encoder(model, cfg)
    tower = variables["params"]["image_encoder"]
    inner_key = next(iter(tower))
    src = jax.tree_util.tree_map(np.asarray, tower[inner_key])
    rng = np.random.RandomState(1)
    randomized = jax.tree_util.tree_map(
        lambda x: np.asarray(rng.randn(*x.shape), np.float32), src)
    sd = nfnet_params_to_timm(randomized)

    new_vars = load_image_tower_weights(variables, sd, arch="nfnet")
    got = _flat(new_vars["params"]["image_encoder"][inner_key])
    want = _flat(randomized)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
    # forward still works with imported weights
    out = model.apply(new_vars, jnp.zeros((1, 64, 64, 3)),
                      method="encode_image")
    assert out.shape == (1, 2304)
