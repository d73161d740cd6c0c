-- found_items schema (behavior parity with the reference's pg_dump
-- balikkin_db_full.sql: table + sequence + PK + GIN full-text index on the
-- description column). Applied automatically by PostgresStore.init_db();
-- shipped standalone for manual provisioning.

CREATE TABLE IF NOT EXISTS found_items (
    id SERIAL PRIMARY KEY,
    image_path TEXT NOT NULL,
    description TEXT NOT NULL,
    location TEXT,
    found_at TIMESTAMP,
    reporter TEXT
);

CREATE INDEX IF NOT EXISTS idx_found_items_description_gin
    ON found_items USING gin (to_tsvector('simple', description));
