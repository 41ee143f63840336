#!/usr/bin/env python
"""Prepare a checkpoint for publishing (ref:
tools/model_converters/publish_model.py — strip optimizer state, stamp a
content hash into the filename).

Takes an orbax checkpoint dir (TrainState layout), keeps only
params/batch_stats, zips it, and renames with the first 8 hex chars of
the archive's sha256 — the same convention the reference uses for its
model-zoo files.

Usage: python tools/model_converters/publish_model.py CONFIG IN_CKPT OUT
       (OUT without extension; writes OUT-<hash8>.zip)
"""
import argparse
import hashlib
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), '..', '..'))


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('in_ckpt')
    p.add_argument('out', help='output path stem (no extension)')
    args = p.parse_args()

    import jax

    from tpu_bev3d.apis import init_model
    from tpu_bev3d.engine.checkpoint import save_checkpoint

    model = init_model(args.config, args.in_ckpt)
    v = jax.device_get(model.variables)    # params + batch_stats only

    with tempfile.TemporaryDirectory() as td:
        # inference-only checkpoint: no opt_state, no step
        save_checkpoint(td, 0, dict(params=v['params'],
                                    batch_stats=v.get('batch_stats', {})))
        archive = shutil.make_archive(args.out, 'zip', td)
    with open(archive, 'rb') as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:8]
    final = f'{args.out}-{digest}.zip'
    os.replace(archive, final)
    print(f'published {final}')


if __name__ == '__main__':
    main()
