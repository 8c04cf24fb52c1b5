-- Hash kernels beyond md5 (reference: sql-tests/expressions/hash/,
-- plus its native sha2/crc32 kernels).  Known-answer pins — these are
-- published test vectors, engine-independent.

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE sha1('abc') = 'a9993e364706816aba3e25717850c26c9cd0d89d'

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE sha2('abc', 256) = 'ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad'

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE crc32(CAST('abc' AS BINARY)) = 891568578

-- md5 agrees across engines (differential)
query
SELECT md5('abc') AS m

-- expect-rows: 1
query spark_only
SELECT 1 AS ok WHERE sha2('', 256) = 'e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855'
