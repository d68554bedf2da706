"""Impala CNN / ResNet / DenseResnet / AdapterMLP shape + numerics smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np

from arp_tpu.models.impala import ImpalaCNN
from arp_tpu.models.layers import AdapterMLP
from arp_tpu.models.resnet import DenseResnet, ResNet18


def test_impala_cnn():
    model = ImpalaCNN()
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(2, 64, 64, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 256)
    assert (np.asarray(out) >= 0).all()  # final relu


def test_adapter_mlp():
    model = AdapterMLP(hidden_dim=32, output_dim=16, num_layers=2)
    x = jnp.ones((4, 16))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (4, 16)


def test_resnet18():
    model = ResNet18(num_outputs=10)
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, 10)


def test_dense_resnet():
    model = DenseResnet(features=32, num_blocks=2, num_outputs=1)
    x = jnp.ones((4, 16))
    params = model.init(jax.random.PRNGKey(0), x)
    assert model.apply(params, x).shape == (4, 1)
