"""TransformerNet (fast-neural-style) model tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensor_stream_tpu.models import TransformerNet, init_params
from tensor_stream_tpu.models.transformer_net import (gram_matrix,
                                                      style_transfer_loss)


def test_forward_shape_preserved():
    """stride-2 downs + 2x ups restore the input resolution
    (reference: transfromer_net.py:29-40)."""
    model = TransformerNet()
    params = init_params(jax.random.PRNGKey(0), 64, 96)
    out = jax.jit(model.apply)(params, jnp.zeros((2, 64, 96, 3)))
    assert out.shape == (2, 64, 96, 3)


def test_parameter_structure():
    params = init_params(jax.random.PRNGKey(0), 32, 32)
    leaves = jax.tree_util.tree_leaves(params)
    n_params = sum(int(np.prod(l.shape)) for l in leaves)
    # conv1(9x9,3->32) + conv2 + conv3 + 5 residuals + 2 upsample + out
    assert n_params > 1_500_000  # same order as the torch model (~1.68M)


def test_gram_matrix_properties():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    g = gram_matrix(x)
    assert g.shape == (2, 4, 4)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g).transpose(0, 2, 1),
                               rtol=1e-5)  # symmetric


@pytest.mark.slow
def test_loss_grads_finite():
    model = TransformerNet()
    params = init_params(jax.random.PRNGKey(0), 32, 32)
    content = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3)) * 255
    style = gram_matrix(content)
    loss, grads = jax.value_and_grad(
        lambda p: style_transfer_loss(model.apply, p, content, style))(params)
    assert np.isfinite(float(loss))
    assert all(np.all(np.isfinite(g)) for g in jax.tree_util.tree_leaves(grads))
