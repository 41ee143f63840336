"""Convert a reference-zoo (mmdet3d) torch .pth checkpoint to an orbax
checkpoint loadable by init_model / Runner.

The mapping table is selected from the model config's type
(utils/mappings.py mapping_for_model — BEVFusion, CenterPoint,
SECOND/VoxelNet, PointPillars). Analogue of the reference's
tools/model_converters/ group, pointed the other way: published mmdet3d
checkpoints → this framework's parameter trees.

Usage:
    python tools/model_converters/convert_mmdet3d_checkpoint.py \
        CONFIG CHECKPOINT.pth OUT_DIR
    # then: init_model(CONFIG, checkpoint=OUT_DIR/ckpt_0) or
    #       tools/test.py CONFIG --work-dir OUT_DIR
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), '..', '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('config')
    ap.add_argument('checkpoint', help='torch .pth state dict')
    ap.add_argument('out_dir')
    ap.add_argument('--quiet', action='store_true')
    args = ap.parse_args()

    if os.environ.get('TPU_BEV3D_PLATFORM') == 'cpu':
        import jax
        jax.config.update('jax_platforms', 'cpu')
    import jax
    import jax.numpy as jnp
    import optax

    from tpu_bev3d.apis.inference import _make_init_batch
    from tpu_bev3d.config import Config
    from tpu_bev3d.engine.train_state import TrainState
    from tpu_bev3d.registry import MODELS
    from tpu_bev3d.utils.mappings import mapping_for_model
    from tpu_bev3d.utils.torch_convert import (convert_torch_checkpoint,
                                               load_torch_state_dict)
    import tpu_bev3d.models  # noqa: F401

    cfg = Config.fromfile(args.config)
    model = MODELS.build(dict(cfg.model))
    batch = {k: jnp.asarray(v)
             for k, v in _make_init_batch(cfg).items()}
    variables = jax.jit(
        lambda r, b: model.init(r, b, mode='tensor'))(
            jax.random.PRNGKey(0), batch)

    sd = load_torch_state_dict(args.checkpoint)
    out = convert_torch_checkpoint(sd, variables,
                                   mapping_for_model(dict(cfg.model)),
                                   verbose=not args.quiet)

    params = out['params']
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats=out.get('batch_stats', {}),
                       opt_state=optax.sgd(0.0).init(params))
    from tpu_bev3d.engine.checkpoint import save_checkpoint
    os.makedirs(args.out_dir, exist_ok=True)
    path = save_checkpoint(args.out_dir, 0, jax.device_get(state))
    print(f'[convert] wrote {path}')


if __name__ == '__main__':
    main()
