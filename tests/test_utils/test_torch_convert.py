"""Torch→JAX weight conversion: numerical equivalence of a converted
conv+BN pair and layout-correct sparse-conv kernels."""
import numpy as np
import pytest

torch = pytest.importorskip('torch')


def test_conv2d_numerical_match():
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from tpu_bev3d.utils.torch_convert import conv2d_kernel

    tconv = torch.nn.Conv2d(3, 8, 3, padding=1, bias=False)
    x = np.random.default_rng(0).normal(
        size=(1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        ty = tconv(torch.from_numpy(x)).numpy()

    fconv = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
    variables = {'params': {'kernel': jnp.asarray(
        conv2d_kernel(tconv.weight))}}
    jy = fconv.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert np.allclose(ty, np.asarray(jy).transpose(0, 3, 1, 2), atol=1e-4)


def test_linear_and_deconv_shapes():
    from tpu_bev3d.utils.torch_convert import (deconv2d_kernel,
                                               linear_kernel,
                                               sparse_conv_kernel)
    lin = torch.nn.Linear(4, 6)
    assert linear_kernel(lin.weight).shape == (4, 6)
    dc = torch.nn.ConvTranspose2d(8, 16, 2, 2)
    assert deconv2d_kernel(dc.weight).shape == (2, 2, 8, 16)
    w = torch.randn(32, 3, 3, 3, 16)  # spconv v2 [O, kz, ky, kx, I]
    k = sparse_conv_kernel(w)
    assert k.shape == (27, 16, 32)
    # z-major enumeration: element (kz=1, ky=0, kx=2) → index 1*9 + 0*3 + 2
    assert np.allclose(k[11], w[:, 1, 0, 2, :].numpy().T)


def test_convert_into_model_tree():
    import jax
    import jax.numpy as jnp
    from tpu_bev3d.models.layers.common import ConvBNAct
    from tpu_bev3d.utils.torch_convert import (auto_map_convbn,
                                               convert_torch_checkpoint)

    m = ConvBNAct(8, 3, padding=1)
    x = jnp.zeros((1, 8, 8, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    sd = {
        'block.conv.weight': torch.randn(8, 3, 3, 3),
        'block.bn.weight': torch.randn(8),
        'block.bn.bias': torch.randn(8),
        'block.bn.running_mean': torch.randn(8),
        'block.bn.running_var': torch.rand(8) + 0.5,
    }
    mapping = auto_map_convbn('block', ())
    out = convert_torch_checkpoint(sd, variables, mapping, verbose=False)
    assert out['params']['Conv_0']['kernel'].shape == (3, 3, 3, 8)
    assert np.allclose(out['batch_stats']['BatchNorm_0']['mean'],
                       sd['block.bn.running_mean'].numpy())


def test_relpos_bias_resample():
    """Window-7 torch bias tables import into a window-8 flax Swin via
    bicubic resampling (identity when windows match)."""
    import numpy as np
    from tpu_bev3d.utils.torch_convert import relpos_bias_resample

    rng = np.random.default_rng(0)
    t7 = rng.normal(size=(13 * 13, 3)).astype(np.float32)
    same = relpos_bias_resample(t7, 7)
    np.testing.assert_array_equal(same, t7)
    t8 = relpos_bias_resample(t7, 8)
    assert t8.shape == (15 * 15, 3)
    # resampling preserves the smooth structure: a constant table stays
    # constant
    const = np.ones((13 * 13, 2), np.float32)
    out = relpos_bias_resample(const, 8)
    np.testing.assert_allclose(out, 1.0, rtol=1e-5)
