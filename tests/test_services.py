"""Finder/Seeker service + DB store tests: report→search round trip on the
shared device-resident index, reference quirks (text-of-description indexing,
fusion weights, crop fallback), concurrency safety, sqlite persistence."""

import datetime as dt
import os
import threading

import numpy as np
import pytest
from PIL import Image

from clip_lora_match_tpu.db.store import FoundItem, SqliteStore, open_store
from clip_lora_match_tpu.index.store import EmbeddingIndex
from clip_lora_match_tpu.services import (
    FinderConfig,
    FinderService,
    SeekerConfig,
    SeekerService,
)
from tests.test_index_retrieval import tiny_encoder, TINY  # noqa: F401 (fixture)


@pytest.fixture()
def env(tmp_path, tiny_encoder):  # noqa: F811
    img_dir = tmp_path / "uploads"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(3):
        p = img_dir / f"item{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8), "RGB"
        ).save(p)
        paths.append(str(p))
    store = SqliteStore(str(tmp_path / "db.sqlite"))
    fcfg = FinderConfig(
        index_path=str(tmp_path / "index.npz"),
        reported_images_dir=str(tmp_path / "reported"),
        k_dim=TINY.projection_dim,
    )
    finder = FinderService(tiny_encoder, fcfg, store=store)
    seeker = SeekerService(
        tiny_encoder,
        SeekerConfig(index_path=fcfg.index_path),
        index=finder.index,  # shared in-process index
    )
    return paths, store, finder, seeker, tmp_path


def test_report_then_search_roundtrip(env):
    paths, store, finder, seeker, tmp = env
    r = finder.report_item(
        paths[0], "tas jansport warna pink", location="parkiran gedung c",
        found_at=dt.datetime(2026, 8, 1, 10, 0), reporter="budi",
    )
    # indexed text includes the location template (ref:finder_service.py:158-163)
    assert r.indexed_text == "tas jansport warna pink, ditemukan di parkiran gedung c"
    assert r.item_id == 1 and r.index_row == 0
    assert os.path.exists(r.stored_image_path)
    finder.report_item(paths[1], "kaca mata pink ungu", location="gk 1")
    finder.report_item(paths[2], "sepatu futsal hijau", location="lapangan")

    res = seeker.search_items(description="tas jansport warna pink, ditemukan di parkiran gedung c")
    assert res[0].index == 0
    assert res[0].text.startswith("tas jansport")

    # DB rows ordered found_at DESC (nulls first by sqlite DESC ordering rules)
    items = store.all_items()
    assert len(items) == 3
    descs = {i.description for i in items}
    # DB descriptions carry the location-joined full_text (ref parity)
    assert "sepatu futsal hijau, ditemukan di lapangan" in descs


def test_seeker_int8_index_matches_fp(env, tiny_encoder):  # noqa: F811
    """index_quantize='int8' serves from the quantized index: same top-1 as
    the fp path on well-separated items, q8 cache invalidated by finder
    appends through the SHARED index object (the production wiring)."""
    paths, store, finder, _, tmp = env
    seeker = SeekerService(
        tiny_encoder,
        SeekerConfig(index_path=finder.cfg.index_path, index_quantize="int8"),
        index=finder.index,
    )
    finder.report_item(paths[0], "tas jansport warna pink", location="parkiran")
    finder.report_item(paths[1], "kaca mata pink ungu", location="gk 1")
    r1 = seeker.search_items(description="tas jansport warna pink, ditemukan di parkiran")
    assert r1[0].index == 0
    # append AFTER the first q8 search: the cached artifact must refresh
    finder.report_item(paths[2], "sepatu futsal hijau", location="lapangan")
    r2 = seeker.search_items(description="sepatu futsal hijau, ditemukan di lapangan", k=3)
    assert r2[0].index == 2
    fp = SeekerService(
        tiny_encoder, SeekerConfig(index_path=finder.cfg.index_path),
        index=finder.index,
    ).search_items(description="sepatu futsal hijau, ditemukan di lapangan", k=3)
    assert [x.index for x in r2] == [x.index for x in fp]


def test_db_row_parity_with_reference(env):
    """ref:finder_service.py:187-199 stores the location-joined full_text as
    the DB description and defaults found_at to now() — NULL found_at would
    perturb the ORDER BY found_at DESC listing in /api/items."""
    paths, store, finder, seeker, tmp = env
    before = dt.datetime.now()
    r = finder.report_item(paths[1], "dompet kulit", location="kantin")
    rows = store.all_items()
    row = next(it for it in rows if it.id == r.item_id)
    assert row.description == "dompet kulit, ditemukan di kantin"
    assert row.found_at is not None
    found_at = row.found_at
    if isinstance(found_at, str):
        found_at = dt.datetime.fromisoformat(found_at)
    assert found_at >= before.replace(microsecond=0)


def test_search_requires_some_query(env):
    *_, seeker, _ = env[0], env[1], env[2], env[3], env[4]
    seeker = env[3]
    with pytest.raises(ValueError):
        seeker.search_items()


def test_multimodal_fusion_weights(env, tiny_encoder):  # noqa: F811
    paths, _, finder, seeker, _ = env
    finder.report_item(paths[0], "tas pink")
    t = tiny_encoder.encode_text("tas pink")
    i = tiny_encoder.encode_image(paths[0])
    fused = 0.5 * t + 0.5 * i
    fused /= np.linalg.norm(fused)
    got = seeker._build_query_embedding("tas pink", paths[0])
    np.testing.assert_allclose(got, fused, atol=1e-5)
    # single-modality paths return the raw (already normalized) embeddings
    np.testing.assert_allclose(
        seeker._build_query_embedding("tas pink", None), t, atol=1e-6
    )
    np.testing.assert_allclose(
        seeker._build_query_embedding(None, paths[0]), i, atol=1e-6
    )


class _BoomCropper:
    def crop_image(self, path):
        raise RuntimeError("detector exploded")


def test_crop_failure_falls_back(env, tiny_encoder):  # noqa: F811
    paths, _, finder, _, tmp = env
    finder.report_item(paths[0], "tas pink")
    cfg = SeekerConfig(index_path=finder.cfg.index_path, use_yolo_crop=True)
    seeker = SeekerService(tiny_encoder, cfg, cropper=_BoomCropper(),
                           index=finder.index)
    res = seeker.search_items(image_path=paths[0])  # must not raise (ref L137-138)
    assert len(res) >= 1


def test_concurrent_reports_are_serialized(env):
    paths, store, finder, _, _ = env
    errs = []

    def report(i):
        try:
            finder.report_item(paths[i % 3], f"item {i}", location=f"loc {i}")
        except Exception as e:
            errs.append(e)

    threads = [threading.Thread(target=report, args=(i,)) for i in range(12)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errs
    assert len(finder.index) == 12
    assert len(store.all_items()) == 12
    assert len(finder.index.texts) == 12


def test_seeker_reloads_on_external_write(env, tiny_encoder):  # noqa: F811
    """Cross-process freshness: a new index row written by another process
    becomes visible without per-query reload."""
    paths, _, finder, _, tmp = env
    finder.report_item(paths[0], "tas pink")
    # independent seeker with its own (file-loaded) index
    seeker = SeekerService(
        tiny_encoder, SeekerConfig(index_path=finder.cfg.index_path)
    )
    assert len(seeker.index) == 1
    import time

    time.sleep(0.01)
    finder.report_item(paths[1], "topi biru")
    os.utime(finder.cfg.index_path)  # ensure mtime moves even on coarse clocks
    seeker.search_items(description="topi biru")
    assert len(seeker.index) == 2


def test_open_store_sqlite_fallback(tmp_path):
    store = open_store(str(tmp_path / "x.sqlite"))
    assert isinstance(store, SqliteStore)
    store.insert(FoundItem(None, "a.jpg", "desc"))
    assert len(store.all_items()) == 1
    store.close()


def test_seeker_k_zero_and_negative(env):
    paths, store, finder, seeker, tmp = env
    finder.report_item(paths[0], description="tas pink", location="kantin")
    assert seeker.search_items(description="tas", k=0) == []
    with pytest.raises(ValueError):
        seeker.search_items(description="tas", k=-1)


def test_db_failure_leaves_no_orphan_index_row(env):
    """DB-first write ordering: when the insert raises, the index must be
    untouched — an orphan index row would surface in search results but not
    /api/items, and client retries would duplicate it."""
    paths, store, finder, seeker, tmp = env

    class _BoomStore:
        def insert(self, item):
            raise RuntimeError("db down")

    finder.store = _BoomStore()
    before = len(finder.index)
    with pytest.raises(RuntimeError):
        finder.report_item(paths[0], description="dompet", location="aula")
    assert len(finder.index) == before
    # and the persisted file (if any) did not grow either
    finder.store = store
    r = finder.report_item(paths[0], description="dompet", location="aula")
    assert r.item_id is not None and len(finder.index) == before + 1


def test_concurrent_append_and_search_is_safe(env):
    """The arena-donation append races readers without the index lock; this
    hammers both sides and asserts no deleted-buffer error escapes."""
    paths, store, finder, seeker, tmp = env
    finder.report_item(paths[0], description="seed", location=None)
    errors = []

    def writer():
        try:
            for i in range(30):
                finder.report_item(paths[i % 3], description=f"item {i}")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    def reader():
        try:
            for _ in range(60):
                seeker.search_items(description="item", k=3)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=writer)] + [
        threading.Thread(target=reader) for _ in range(2)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    assert len(finder.index) == 31


def test_queued_encoder_matches_direct(env, tiny_encoder):  # noqa: F811
    from clip_lora_match_tpu.services import QueuedEncoder

    paths, *_ = env
    qe = QueuedEncoder(tiny_encoder, linger_ms=1.0)
    try:
        np.testing.assert_allclose(
            qe.encode_text("tas pink"), tiny_encoder.encode_text("tas pink"),
            atol=1e-6,
        )
        np.testing.assert_allclose(
            qe.encode_image(paths[0]), tiny_encoder.encode_image(paths[0]),
            atol=1e-6,
        )
        # non-queued forms pass through unchanged
        out = qe.encode_text(["a", "b"])
        assert out.shape[0] == 2
        assert qe.arch.projection_dim == tiny_encoder.arch.projection_dim
    finally:
        qe.close()
    with pytest.raises(RuntimeError):
        qe.encode_text("after close")


def test_prefetch_stops_worker_on_early_exit():
    import threading as _t

    from clip_lora_match_tpu.data.dataset import prefetch

    started = _t.active_count()
    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield {"x": np.zeros((1,))}

    it = prefetch(gen(), depth=2)
    next(it)
    it.close()  # abandon early → generator finally fires → worker stops
    for _ in range(50):
        if _t.active_count() <= started:
            break
        import time

        time.sleep(0.05)
    assert _t.active_count() <= started, "prefetch worker leaked"
    assert len(produced) < 1000  # worker stopped early, not drained


def test_open_store_parses_database_urls(tmp_path, monkeypatch):
    """sqlite:/// URLs resolve to the FILE path (not a literal 'sqlite:'
    directory), dialect-qualified postgres URLs route to postgres (psycopg2
    absent here -> ImportError, proving the routing), and unknown schemes
    fail loudly instead of silently becoming sqlite files."""
    from clip_lora_match_tpu.db.store import open_store

    db = tmp_path / "app.db"
    store = open_store(f"sqlite:///{db}")
    store.insert(FoundItem(None, "a.jpg", "desc"))
    assert db.exists() and not (tmp_path / "sqlite:").exists()
    store.close()

    with pytest.raises((ImportError, Exception)) as ei:
        open_store("postgresql+psycopg2://u:p@localhost/nope")
    assert not isinstance(ei.value, ValueError)  # routed to postgres, not rejected

    with pytest.raises(ValueError):
        open_store("mysql://localhost/db")


def test_optimizer_schedule_horizon_with_grad_accum():
    """The LR schedule ticks once per accumulation window, so its horizon
    must be micro-steps / accumulation — otherwise warmup stretches 4x and
    the decay never reaches zero (reference divides the same way,
    ref:scripts/train_lora.py:156)."""
    from clip_lora_match_tpu.core.config import TrainingConfig
    from clip_lora_match_tpu.train.step import make_optimizer

    micro_steps = 400
    cfg = TrainingConfig(gradient_accumulation_steps=4, learning_rate=1e-3)
    _, sched = make_optimizer(cfg, micro_steps)
    inner_steps = micro_steps // 4
    # end of the inner-step horizon decays to ~0
    assert float(sched(inner_steps)) < 1e-5
    # without the fix, the schedule at inner_steps sat at ~75% of base lr
    assert float(sched(inner_steps // 2)) > 1e-4
