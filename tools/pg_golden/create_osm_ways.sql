CREATE TABLE osm_ways ("way_id" BIGINT NOT NULL, "wkb" BYTEA , "region" TEXT , "subregion" TEXT , "n_points" INTEGER NOT NULL, "area" FLOAT8 NOT NULL, "pgosm_date" TEXT , "load_region" TEXT NOT NULL)
