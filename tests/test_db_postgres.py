"""PostgresStore exercised against a fake DBAPI driver.

psycopg2 is not installed in this environment (CLAUDE.md), so the production
write path (ref:src/db/db.py:21-30, ref:src/api/main.py:256-295) is covered
by injecting a recording fake into sys.modules: every statement + params the
store would issue against Postgres is captured and asserted, including the
schema DDL (GIN index parity with ref:balikkin_db_full.sql), INSERT ...
RETURNING id, ORDER BY found_at DESC, and rollback-on-error semantics
(ref:finder_service.py:200-202).
"""

import datetime as dt
import sys

import pytest


class FakeCursor:
    def __init__(self, conn):
        self.conn = conn
        self._result = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def execute(self, sql, params=None):
        self.conn.statements.append((" ".join(sql.split()), params))
        if self.conn.fail_next:
            self.conn.fail_next = False
            raise RuntimeError("injected db failure")
        s = sql.lstrip().upper()
        if s.startswith("INSERT") and "RETURNING" in s:
            row_id = len(self.conn.rows) + 1
            self.conn.rows.append((row_id,) + tuple(params))
            self._result = [(row_id,)]
        elif s.startswith("SELECT"):
            rows = list(self.conn.rows)
            if "DESC" in s:
                rows.reverse()
            self._result = rows
        else:
            self._result = []

    def fetchone(self):
        return self._result[0] if self._result else None

    def fetchall(self):
        return list(self._result)


class FakeConnection:
    def __init__(self, kwargs):
        self.connect_kwargs = kwargs
        self.statements = []
        self.rows = []  # committed + uncommitted (simplified)
        self.commits = 0
        self.rollbacks = 0
        self.closed = False
        self.fail_next = False

    def cursor(self):
        return FakeCursor(self)

    def commit(self):
        self.commits += 1

    def rollback(self):
        self.rollbacks += 1

    def close(self):
        self.closed = True


class FakePsycopg2:
    def __init__(self):
        self.connections = []

    def connect(self, dsn=None, **kwargs):
        conn = FakeConnection({"dsn": dsn, **kwargs})
        self.connections.append(conn)
        return conn


@pytest.fixture()
def fake_pg(monkeypatch):
    fake = FakePsycopg2()
    monkeypatch.setitem(sys.modules, "psycopg2", fake)
    return fake


def test_postgres_store_schema_and_roundtrip(fake_pg):
    from clip_lora_match_tpu.db.store import FoundItem, PostgresStore

    store = PostgresStore(dsn="postgresql://u:p@dbhost:5432/balikkin_db")
    conn = fake_pg.connections[0]
    assert conn.connect_kwargs["dsn"] == "postgresql://u:p@dbhost:5432/balikkin_db"

    # schema DDL: found_items table + the GIN full-text index
    # (ref:balikkin_db_full.sql idx_found_items_description_gin)
    ddl = [s for s, _ in conn.statements]
    assert any("CREATE TABLE IF NOT EXISTS found_items" in s for s in ddl)
    assert any(
        "USING gin (to_tsvector('simple', description))" in s for s in ddl
    )
    assert conn.commits == 1  # init_db committed

    when = dt.datetime(2026, 8, 1, 10, 0)
    new_id = store.insert(
        FoundItem(None, "img/a.jpg", "tas pink kanken, ditemukan di lab iot",
                  "lab iot", when, "budi")
    )
    assert new_id == 1
    sql, params = conn.statements[-1]
    assert sql.startswith("INSERT INTO found_items")
    assert "RETURNING id" in sql
    assert params == (
        "img/a.jpg", "tas pink kanken, ditemukan di lab iot", "lab iot",
        when, "budi",
    )
    assert conn.commits == 2

    store.insert(FoundItem(None, "img/b.jpg", "dompet", None, None, None))
    items = store.all_items(order_desc=True)
    sql, _ = conn.statements[-1]
    assert "ORDER BY found_at DESC, id DESC" in sql
    # DESC ordering surfaces the later row first
    assert [i.image_path for i in items] == ["img/b.jpg", "img/a.jpg"]
    assert items[1].found_at == when

    store.close()
    assert conn.closed


def test_postgres_store_rolls_back_on_failure(fake_pg):
    from clip_lora_match_tpu.db.store import FoundItem, PostgresStore

    store = PostgresStore(dsn="postgresql://u@h/db")
    conn = fake_pg.connections[0]
    conn.fail_next = True
    with pytest.raises(RuntimeError, match="injected db failure"):
        store.insert(FoundItem(None, "x.jpg", "desc"))
    assert conn.rollbacks == 1
    # store stays usable after the rollback
    assert store.insert(FoundItem(None, "y.jpg", "desc2")) == 1


def test_open_store_dispatches_postgres_urls(fake_pg):
    from clip_lora_match_tpu.db.store import PostgresStore, open_store

    for url in (
        "postgresql://u:p@h:5432/db",
        "postgres://u:p@h/db",
        "postgresql+psycopg2://u:p@h/db",
    ):
        store = open_store(url)
        assert isinstance(store, PostgresStore)
        assert fake_pg.connections[-1].connect_kwargs["dsn"] == url


def test_open_store_config_path(fake_pg, tmp_path):
    """db_config.yaml path → PostgresStore with the file's creds
    (ref:src/db/db.py:12-30 loads config/db_config.yaml)."""
    cfg = tmp_path / "db_config.yaml"
    cfg.write_text(
        "postgres:\n  host: pghost\n  port: 5433\n  user: bal\n"
        "  password: secret\n  dbname: balikkin_db\n"
    )
    from clip_lora_match_tpu.db.store import PostgresStore, open_store

    store = open_store(db_config_path=str(cfg))
    assert isinstance(store, PostgresStore)
    kw = fake_pg.connections[-1].connect_kwargs
    assert kw["host"] == "pghost" and kw["port"] == 5433
    assert kw["dbname"] == "balikkin_db"


def test_finder_service_issues_postgres_insert(fake_pg, tmp_path):
    """End-to-end: FinderService.report_item → PostgresStore records the
    exact INSERT the production path would issue (VERDICT r2 missing #2)."""
    import numpy as np
    from PIL import Image
    import jax

    from tests.test_index_retrieval import TINY
    from clip_lora_match_tpu.core.config import ClipConfig, PreprocessConfig
    from clip_lora_match_tpu.db.store import PostgresStore
    from clip_lora_match_tpu.models import clip as jclip
    from clip_lora_match_tpu.models.encoder import ClipEncoder
    from clip_lora_match_tpu.services import FinderConfig, FinderService

    params = jclip.init_params(jax.random.PRNGKey(0), TINY)
    enc = ClipEncoder(
        params, arch=TINY,
        config=ClipConfig(arch=TINY, preprocess=PreprocessConfig(image_size=32)),
    )
    store = PostgresStore(dsn="postgresql://u@h/balikkin_db")
    finder = FinderService(
        enc,
        FinderConfig(
            index_path=str(tmp_path / "index.npz"),
            reported_images_dir=str(tmp_path / "reported"),
            k_dim=enc.arch.projection_dim,
        ),
        store=store,
    )
    img = tmp_path / "up.jpg"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (40, 40, 3), dtype=np.uint8),
        "RGB",
    ).save(img)
    result = finder.report_item(str(img), description="tas pink", location="lab")
    conn = fake_pg.connections[0]
    sql, db_params = conn.statements[-1]
    assert sql.startswith("INSERT INTO found_items")
    assert db_params[1] == "tas pink, ditemukan di lab"
    assert result.item_id == 1
