"""`python -m horizongs_tpu.cli.view -m PATH` — remote viewer server.

Serves a trained model over the SIBR network-GUI TCP protocol
(reference `gaussian_renderer/network_gui.py`; shipped disabled at
`train.py:759`). Connect with a SIBR remote client or any client
speaking the same framing.
"""
from __future__ import annotations

import argparse


def main(argv=None):
    parser = argparse.ArgumentParser(description="Viewer server")
    parser.add_argument("-m", "--model_path", required=True)
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--iteration", type=int, default=-1)
    parser.add_argument("--rasterizer", default="auto")
    parser.add_argument("--max_requests", type=int, default=None)
    args = parser.parse_args(argv)

    from horizongs_tpu.viewer.server import serve_model
    print(f"viewer listening on {args.host}:{args.port}")
    serve_model(args.model_path, host=args.host, port=args.port,
                rasterizer=args.rasterizer, load_iteration=args.iteration,
                max_requests=args.max_requests)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
