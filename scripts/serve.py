"""Run the FastAPI service (role of ref:src/api/main.py module-level app;
requires the optional [api] extra)."""

import argparse

from _common import add_encoder_args, build_encoder


def main():
    p = argparse.ArgumentParser(description="Serve the Balikkin TPU API")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--db", default=None)
    add_encoder_args(p)
    args = p.parse_args()

    import uvicorn

    from clip_lora_match_tpu.api.main import create_app
    from clip_lora_match_tpu.db.store import open_store

    app = create_app(
        encoder=build_encoder(args),
        store=open_store(args.db),
        data_dir=args.data_dir,
    )
    uvicorn.run(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
