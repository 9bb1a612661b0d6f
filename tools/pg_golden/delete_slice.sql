DELETE FROM osm_ways WHERE "load_region" = ?
