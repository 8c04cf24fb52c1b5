query tolerance=1e-12
SELECT pi() AS p, degrees(pi()) AS deg, radians(180.0) AS rad, degrees(radians(90.0)) AS rt
