"""Model zoo: output shapes, statelessness of NF nets, get_network grammar."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_dataset_distillation_tpu.models import zoo
from multimodal_dataset_distillation_tpu.models.bert import (
    BERT_TINY,
    BertEncoder,
    HashingTokenizer,
    TextEncoder,
)
from multimodal_dataset_distillation_tpu.models.projection import ProjectionHead

KEY = jax.random.PRNGKey(0)


def test_projection_head_shapes_and_residual():
    m = ProjectionHead(embedding_dim=768, projection_dim=2304)
    x = jnp.ones((2, 768))
    v = m.init(KEY, x)
    y = m.apply(v, x, deterministic=True)
    assert y.shape == (2, 2304)
    # param count: 768*2304+2304 + 2304*2304+2304 + 2*2304 ~= 7.1M
    n = sum(int(p.size) for p in jax.tree_util.tree_leaves(v))
    assert abs(n - 7_083_264) < 10_000


@pytest.mark.parametrize("name,dim", [("convnet_tiny", 64), ("convnet", 768),
                                      ("resnet18_gn", 512)])
def test_image_towers_small(name, dim):
    enc, d = zoo.create_image_encoder(name)
    assert d == dim
    x = jnp.ones((2, 32, 32, 3))
    v = enc.init({"params": KEY}, x)
    y = enc.apply(v, x)
    assert y.shape == (2, dim)


def test_nfnet_l0_stateless_and_shape():
    enc, d = zoo.create_image_encoder("nfnet")
    x = jnp.ones((1, 64, 64, 3))
    v = enc.init({"params": KEY}, x)
    assert set(v.keys()) == {"params"}  # no batch_stats: distillation-safe
    y = enc.apply(v, x)
    assert y.shape == (1, 2304)
    n = sum(int(p.size) for p in jax.tree_util.tree_leaves(v))
    assert 30e6 < n < 36e6  # timm nfnet_l0 headless ~= 32.8M


def test_bert_tiny_cls():
    m = BertEncoder(BERT_TINY)
    ids = jnp.ones((2, 10), jnp.int32)
    mask = jnp.ones((2, 10), jnp.int32)
    v = m.init(KEY, ids, mask)
    out = m.apply(v, ids, mask)
    assert out.shape == (2, 10, 128)


def test_bert_padding_invariance():
    """CLS embedding must not depend on padding length (masked attention)."""
    m = BertEncoder(BERT_TINY)
    ids = jnp.asarray([[1, 5, 6, 2]], jnp.int32)
    mask = jnp.ones_like(ids)
    v = m.init(KEY, ids, mask)
    cls_short = m.apply(v, ids, mask)[:, 0]
    ids_pad = jnp.concatenate([ids, jnp.zeros((1, 6), jnp.int32)], axis=1)
    mask_pad = jnp.concatenate([mask, jnp.zeros((1, 6), jnp.int32)], axis=1)
    cls_pad = m.apply(v, ids_pad, mask_pad)[:, 0]
    np.testing.assert_allclose(np.asarray(cls_short), np.asarray(cls_pad),
                               rtol=1e-4, atol=1e-5)


def test_text_encoder_offline():
    enc = TextEncoder(variant="tiny", pretrained=False, seed=0)
    out = enc.encode(["a dog runs", "a cat sits"])
    assert out.shape == (2, 128)
    # deterministic
    out2 = enc.encode(["a dog runs", "a cat sits"])
    np.testing.assert_array_equal(out, out2)
    # distinct captions -> distinct embeddings
    assert not np.allclose(out[0], out[1])


def test_hashing_tokenizer():
    tk = HashingTokenizer(1000)
    ids, mask = tk(["hello world", "hello"])
    assert ids.shape == mask.shape
    assert ids[0, 0] == tk.cls_id
    assert mask[1].sum() == 3  # cls + 1 word + sep


@pytest.mark.parametrize("spec,cls", [
    ("MLP", "MLP"), ("LeNet", "LeNet"), ("AlexNet", "AlexNet"),
    ("ConvNetD2", "ConvNet"), ("ConvNetW64", "ConvNet"),
    ("ConvNetBN", "ConvNet"), ("ConvNetMP", "ConvNet"),
    ("VGG11", "VGG"), ("ResNet18_AP", "ResNet"),
])
def test_get_network_grammar(spec, cls):
    net = zoo.get_network(spec, 3, 10)
    assert type(net).__name__ == cls
    x = jnp.ones((2, 32, 32, 3))
    if spec == "ConvNetBN":
        v = net.init({"params": KEY}, x, train=False)
        y = net.apply(v, x, train=False)
    else:
        v = net.init({"params": KEY}, x)
        y = net.apply(v, x)
    assert y.shape == (2, 10)


def test_eval_pool_grammar():
    assert zoo.get_eval_pool("S", "ConvNetBN", "x") == ["ConvNet"]
    assert len(zoo.get_eval_pool("M", "m", "x")) == 5
    assert zoo.get_eval_pool("C", "ResNet18", "x") == ["ResNet18", "ConvNet"]


def test_modified_resnet_attnpool():
    """CLIP ModifiedResNet rebuilt working (reference model.py is partially
    dead at HEAD — build_model references an undefined CLIP class)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from multimodal_dataset_distillation_tpu.models.modified_resnet import (
        ModifiedResNet,
    )

    m = ModifiedResNet(layers=(1, 1, 1, 1), output_dim=64, heads=4, width=16)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(v, x)
    assert out.shape == (2, 64)
    assert "batch_stats" in v
    # train mode updates running stats
    out2, updated = m.apply(v, x, train=True, mutable=["batch_stats"])
    assert out2.shape == (2, 64)
    leaves_a = jax.tree_util.tree_leaves(v["batch_stats"])
    leaves_b = jax.tree_util.tree_leaves(updated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(leaves_a, leaves_b))


def test_convnext_tower():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from multimodal_dataset_distillation_tpu.models.zoo import (
        IMAGE_FEATURE_DIMS,
        create_image_encoder,
    )

    tower, dim = create_image_encoder("convnext")
    assert dim == IMAGE_FEATURE_DIMS["convnext"] == 768
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3), jnp.float32)
    v = tower.init(jax.random.PRNGKey(0), x)
    out = tower.apply(v, x)
    assert out.shape == (2, 768)
    assert np.isfinite(np.asarray(out)).all()
