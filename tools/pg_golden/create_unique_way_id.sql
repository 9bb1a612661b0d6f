CREATE UNIQUE INDEX IF NOT EXISTS osm_ways_way_id_key ON osm_ways (way_id) NULLS NOT DISTINCT
