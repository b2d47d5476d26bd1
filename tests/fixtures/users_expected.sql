ADD JAR hive-json-serde-0.2.jar;

CREATE TABLE data (
	id TINYINT,
	name VARCHAR(6),
	income ???,
	city STRUCT<
		name: VARCHAR(9),
		area: DOUBLE
	>,
	children ARRAY<
		STRUCT<
			name: VARCHAR(7),
			toy: VARCHAR(10)
		>
	>,
	cars ARRAY<
		???
	>,
	num NUMERIC(16, 2),
	employed BOOLEAN
) ROW FORMAT SERDE 'org.apache.hadoop.hive.contrib.serde2.JsonSerde';

LOAD DATA LOCAL INPATH 'tests/fixtures/users.json' INTO TABLE data;
