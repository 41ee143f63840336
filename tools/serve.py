#!/usr/bin/env python
"""HTTP model server with the TorchServe handler's request/response
semantics (ref: tools/deployment/mmdet3d2torchserve.py packaging +
mmdet3d_handler.py — preprocess raw/base64 float32 points → inference →
{'3dbbox': [...], 'score': [...]} rows; test_torchserver.py posts the
.bin file body to /predictions/<model>).

Serves either a live config (+ optional checkpoint) or a StableHLO
artifact from deploy/export (``--exported``). Endpoints:

  POST /predictions/<anything>   body = raw float32 .bin bytes, or JSON
                                 {"data": <base64 of the same>}
  GET  /ping                     -> {"status": "Healthy"}

Usage: python tools/serve.py CONFIG [--checkpoint DIR] [--exported PATH]
       [--port 8080] [--score-thr 0.5] [--load-dim 4]
"""
import argparse
import base64
import json
import os
import sys
from http.server import BaseHTTPRequestHandler, HTTPServer

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))


def build_predict(args):
    """→ (predict(points_ndarray) -> dict of numpy, point_dim)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpu_bev3d.apis import init_model
    from tpu_bev3d.apis.inference import _point_dim

    model = init_model(args.config, args.checkpoint)
    dim = _point_dim(model.cfg)
    cap = int(model.cfg.get('inference_num_points', 120000))
    if args.exported:
        from tpu_bev3d.deploy import load_exported
        fn = load_exported(args.exported)

        def predict(pts):
            n = min(len(pts), cap)
            buf = np.zeros((cap, dim), np.float32)
            buf[:n] = pts[:n, :dim]
            mask = np.zeros((cap,), bool)
            mask[:n] = True
            out = fn(dict(points=jnp.asarray(buf)[None],
                          points_mask=jnp.asarray(mask)[None]))
            return jax.device_get(out)
    else:
        from tpu_bev3d.apis import inference_detector

        def predict(pts):
            r = inference_detector(model, pts)[0]
            return dict(bboxes=r['bboxes'][None], scores=r['scores'][None],
                        labels=r['labels'][None],
                        mask=np.ones((1, len(r['scores'])), bool))
        import numpy as np
    return predict, dim


def make_handler(predict, dim, score_thr):
    import numpy as np

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):      # quiet
            pass

        def _reply(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header('Content-Type', 'application/json')
            self.send_header('Content-Length', str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == '/ping':
                self._reply(200, {'status': 'Healthy'})
            else:
                self._reply(404, {'error': 'not found'})

        def do_POST(self):
            if not self.path.startswith('/predictions'):
                self._reply(404, {'error': 'not found'})
                return
            n = int(self.headers.get('Content-Length', 0))
            raw = self.rfile.read(n)
            ctype = self.headers.get('Content-Type', '')
            try:
                if 'json' in ctype:
                    row = json.loads(raw)
                    data = row.get('data') or row.get('body')
                    raw = base64.b64decode(data) \
                        if isinstance(data, str) else bytes(data)
                pts = np.frombuffer(raw, np.float32).reshape(-1, dim)
            except Exception as e:  # noqa: BLE001 — client error surface
                self._reply(400, {'error': f'bad request: {e}'})
                return
            out = predict(pts)
            keep = (np.asarray(out['scores'][0]) > score_thr) \
                & np.asarray(out['mask'][0])
            # the reference handler's response row shape
            self._reply(200, [{
                '3dbbox': np.asarray(out['bboxes'][0])[keep].tolist(),
                'score': np.asarray(out['scores'][0])[keep].tolist(),
                'label': np.asarray(out['labels'][0])[keep].tolist(),
            }])

    return Handler


def main():
    p = argparse.ArgumentParser()
    p.add_argument('config')
    p.add_argument('--checkpoint', default=None)
    p.add_argument('--exported', default=None,
                   help='StableHLO artifact from deploy.export_model')
    p.add_argument('--port', type=int, default=8080)
    p.add_argument('--score-thr', type=float, default=0.5)
    args = p.parse_args()

    predict, dim = build_predict(args)
    srv = HTTPServer(('127.0.0.1', args.port),
                     make_handler(predict, dim, args.score_thr))
    print(f'serving on http://127.0.0.1:{args.port} '
          f'(POST /predictions/model, GET /ping)', flush=True)
    srv.serve_forever()


if __name__ == '__main__':
    main()
