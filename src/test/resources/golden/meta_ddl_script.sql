-- database:graft_meta
CREATE DATABASE IF NOT EXISTS `graft_meta`;
-- table:graft_meta.lineitem_part
CREATE TABLE `graft_meta`.`lineitem_part` (`l_orderkey` BIGINT, `l_partkey` BIGINT, `l_suppkey` BIGINT, `l_linenumber` INT, `l_quantity` DOUBLE, `l_extendedprice` DOUBLE, `l_discount` DOUBLE, `l_tax` DOUBLE, `l_linestatus` STRING, `l_shipdate` TIMESTAMP_NTZ, `l_returnflag` STRING) USING parquet PARTITIONED BY (`l_returnflag`) LOCATION '<SCRATCH>/<SFKEY>/lineitem_by_flag';
-- table:graft_meta.lineitem_part#part0
ALTER TABLE `graft_meta`.`lineitem_part` ADD IF NOT EXISTS PARTITION (`l_returnflag` = 'A') PARTITION (`l_returnflag` = 'N') PARTITION (`l_returnflag` = 'R');
-- table:graft_meta.nation_meta
CREATE TABLE `graft_meta`.`nation_meta` (`n_nationkey` INT, `n_name` STRING, `n_regionkey` INT) USING parquet LOCATION '<SF>/nation.parquet';
