statement
CREATE TABLE t_sja(id int, mgr int, name string) USING parquet

statement
INSERT INTO t_sja VALUES (1, NULL, 'ceo'), (2, 1, 'vp'), (3, 1, 'vp2'), (4, 2, 'ic')

query
SELECT e.name AS emp, m.name AS mgr_name FROM t_sja e LEFT JOIN t_sja m ON e.mgr = m.id ORDER BY e.id
