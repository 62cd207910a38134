COPY cities FROM '/tmp/duck_exp/cities.csv' (FORMAT 'csv', quote '"', delimiter ',', header 1);
COPY metrics FROM '/tmp/duck_exp/metrics.csv' (FORMAT 'csv', quote '"', delimiter ',', header 1);
