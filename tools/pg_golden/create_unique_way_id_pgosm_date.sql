CREATE UNIQUE INDEX IF NOT EXISTS osm_ways_way_id_pgosm_date_key ON osm_ways (way_id, pgosm_date) NULLS NOT DISTINCT
