"""Serving CLI: long-lived HTTP saliency inference on the TPU.

    python -m cp360_tpu.cli.serve --weights resnet50.npz \
        [--clstm CLSTM.npz] [--host 0.0.0.0] [--port 8360] [--config config.yaml]

POST an equirectangular JPEG/PNG to /saliency (add ?format=png for a
heatmap image); GET /healthz for liveness.  With --clstm, streaming
temporal sessions are served on /temporal/{session,frame,close} — see
cp360_tpu/serving/server.py.
"""

from __future__ import annotations

import argparse

from cp360_tpu.config import add_config_overrides, config_from_args
from cp360_tpu.serving.server import SaliencyModel, serve


def main(argv=None):
    from cp360_tpu.utils.platform import apply_platform, apply_platform_env

    apply_platform_env()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--weights", type=str, default=None, help=".npz/.pth backbone")
    parser.add_argument("--clstm", type=str, default=None,
                        help=".npz/.pth ConvLSTM — enables /temporal streaming")
    parser.add_argument("--mode", type=str, default="resnet50")
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8360)
    add_config_overrides(parser)
    args, _unknown = parser.parse_known_args(argv)
    from cp360_tpu.config import warn_ignored_args

    warn_ignored_args(_unknown)
    cfg = config_from_args(args)
    apply_platform(cfg)

    from cp360_tpu.cli.extract_features import load_params

    params = load_params(args.weights, args.mode)
    clstm_params = None
    if args.clstm:
        from cp360_tpu.cli.test_temporal import load_clstm

        clstm_params = load_clstm(args.clstm)
    from cp360_tpu.utils.transfer import warm_link

    # absorb the degraded-tunnel cold first-fetch before bucket warmup so
    # the first client request never pays it
    warm_link()
    model = SaliencyModel(params, cfg, arch=args.mode, clstm_params=clstm_params)
    httpd = serve(model, host=args.host, port=args.port)
    print(f"serving saliency on http://{args.host}:{args.port} (arch {args.mode}"
          f"{', temporal' if clstm_params is not None else ''})")

    # production shutdown: SIGTERM (systemd/k8s) drains like Ctrl-C — stop
    # accepting, finish in-flight handlers, fail queued batcher waiters
    import signal
    import threading

    def _term(signum, frame):
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _term)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.shutdown()
    finally:
        # join in-flight handler threads (ThreadingMixIn block_on_close;
        # HTTP/1.0 handlers exit after their one response) BEFORE failing
        # the batchers — otherwise a request that already computed gets its
        # connection killed mid-write
        httpd.server_close()
        model._batcher.close()
        if model._temporal_batcher is not None:
            model._temporal_batcher.close()
    print("serve: shut down cleanly")


if __name__ == "__main__":
    main()
