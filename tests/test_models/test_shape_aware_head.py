"""SSN ShapeAwareHead: per-shape-group towers + combined anchor loss."""
import numpy as np
import jax
import jax.numpy as jnp

from tpu_bev3d.models.dense_heads import ShapeAwareHead


def make_head():
    rng_all = [[-10, -10, -1.8, 10, 10, -1.8]]
    return ShapeAwareHead(
        num_classes=4, in_channels=16, box_code_size=7,
        tasks=[
            dict(class_ids=[0, 1], ranges=rng_all * 2,
                 sizes=[[0.6, 0.6, 1.7], [1.8, 0.6, 1.7]],
                 shared_conv_channels=(16, 16),
                 shared_conv_strides=(1, 1)),
            dict(class_ids=[2, 3], ranges=rng_all * 2,
                 sizes=[[4.6, 1.9, 1.7], [10.5, 2.9, 3.4]],
                 shared_conv_channels=(16, 16),
                 shared_conv_strides=(2, 1)),
        ],
        assigner_cfgs=[dict(pos_iou_thr=0.5, neg_iou_thr=0.3,
                            min_pos_iou=0.3)] * 4,
        nms_pre=64, max_num=16)


def test_shape_aware_loss_and_predict():
    head = make_head()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 16))
    variables = head.init(jax.random.PRNGKey(1), x)
    outs, _ = head.apply(variables, x, mutable=['batch_stats'])
    cls, reg, d, featmaps = outs
    # task 0 at 16x16 (stride 1), task 1 at 8x8 (stride 2)
    assert featmaps == ((16, 16), (8, 8))
    A = 16 * 16 * 4 + 8 * 8 * 4
    assert cls.shape == (2, A, 4)

    gtb = jnp.asarray([[[2.0, 1.0, -1.8, 4.6, 1.9, 1.7, 0.0]] * 2] * 2)
    gtl = jnp.asarray([[2, 2]] * 2)
    gtm = jnp.asarray([[True, False]] * 2)
    losses = head.apply(variables, outs, gtb, gtl, gtm,
                        method=head.loss_by_feat)
    for k, v in losses.items():
        assert np.isfinite(float(v)), (k, v)

    preds = head.apply(variables, outs, method=head.predict_by_feat)
    assert preds['bboxes'].shape == (2, 16, 7)
    assert np.isfinite(np.asarray(preds['bboxes'])).all()
