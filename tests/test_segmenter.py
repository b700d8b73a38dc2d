import numpy as np

import jax
import jax.numpy as jnp

from cppf_tpu.data.laptop_aux import LaptopAuxDataset, make_laptop_mesh
from cppf_tpu.models.segmenter import FCNResNet50
from cppf_tpu.train.laptop_aux import ce_ignore_loss, seg_train_step


def test_laptop_mesh_two_parts():
    mesh, labels = make_laptop_mesh(100.0)
    assert mesh.vertices.shape[0] == 16
    assert (labels == 0).sum() == (labels == 1).sum() == 12


def test_laptop_aux_dataset():
    ds = LaptopAuxDataset(data_root="/nonexistent", seed=0, epoch_len=2)
    rgb, label = ds.sample()
    assert rgb.shape == (224, 224, 3) and rgb.dtype == np.float32
    assert label.shape == (224, 224) and label.dtype == np.int64
    vals = set(np.unique(label).tolist())
    assert vals <= {-100, 0, 1}
    assert (label == 0).sum() > 50 and (label == 1).sum() > 50


def test_fcn_resnet50_shapes():
    model = FCNResNet50(num_classes=2)
    x = jnp.zeros((1, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (1, 64, 64, 2)
    # dilated backbone: feature stride 8 before upsample → logits vary spatially
    assert np.isfinite(np.asarray(out)).all()


def test_ce_ignore_loss():
    logits = jnp.array([[[[10.0, -10.0], [-10.0, 10.0]]]])
    labels = jnp.array([[[0, -100]]])
    # only the first pixel counts and it is correct → near-zero loss
    loss = float(ce_ignore_loss(logits, labels))
    assert loss < 1e-3
    labels_bad = jnp.array([[[1, -100]]])
    assert float(ce_ignore_loss(logits, labels_bad)) > 5.0


def test_seg_train_step_reduces_loss():
    import optax

    model = FCNResNet50(num_classes=2)
    rng = jax.random.PRNGKey(0)
    x = jax.random.uniform(rng, (2, 32, 32, 3))
    y = (x[..., 0] > 0.5).astype(jnp.int64)
    params = model.init(rng, x)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    losses = []
    for i in range(8):
        params, opt_state, loss = seg_train_step(
            params, opt_state, jax.random.PRNGKey(i), x, y, tx)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
