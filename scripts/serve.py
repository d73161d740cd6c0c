"""Serve the HTTP API (role of ref:src/api/main.py module-level app).

Uses FastAPI+uvicorn when installed (`--binding fastapi`); otherwise the
dependency-free stdlib binding (api/http_server.py) serves the same REST
surface — so this entry point actually runs in environments without the
[api] extra, unlike the reference which hard-requires fastapi.
"""

import argparse

from _common import add_encoder_args, build_encoder


def main():
    p = argparse.ArgumentParser(description="Serve the Balikkin TPU API")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--db", default=None)
    p.add_argument(
        "--index-quantize",
        choices=["none", "int8"],
        default="none",
        help="serve searches from an int8-quantized index (half/quarter "
        "HBM, int8 MXU retrieval; selection exact over quantized scores)",
    )
    p.add_argument(
        "--binding",
        choices=["auto", "fastapi", "stdlib"],
        default="auto",
        help="HTTP stack: fastapi+uvicorn, the stdlib http.server binding, "
        "or auto (fastapi when importable, stdlib otherwise)",
    )
    add_encoder_args(p)
    args = p.parse_args()

    binding = args.binding
    if binding == "auto":
        try:
            import fastapi  # noqa: F401
            import uvicorn  # noqa: F401

            binding = "fastapi"
        except ImportError:
            binding = "stdlib"

    from clip_lora_match_tpu.db.store import open_store

    encoder = build_encoder(args)
    store = open_store(args.db)

    if binding == "fastapi":
        import uvicorn

        from clip_lora_match_tpu.api.main import create_app

        app = create_app(
            encoder=encoder, store=store, data_dir=args.data_dir,
            index_quantize=args.index_quantize,
        )
        uvicorn.run(app, host=args.host, port=args.port)
    else:
        from clip_lora_match_tpu.api.http_server import create_server

        server = create_server(
            args.host,
            args.port,
            encoder=encoder,
            store=store,
            data_dir=args.data_dir,
            index_quantize=args.index_quantize,
        )
        print(
            f"[serve] stdlib binding listening on "
            f"http://{server.server_address[0]}:{server.server_address[1]}",
            # Wrappers (and the CLI smoke test) parse this line through a
            # pipe; without an explicit flush it sits in the block buffer
            # until process exit whenever stdout is not a tty.
            flush=True,
        )
        try:
            server.serve_forever()
        except KeyboardInterrupt:
            server.shutdown()


if __name__ == "__main__":
    main()
