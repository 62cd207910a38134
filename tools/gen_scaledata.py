#!/usr/bin/env python3
"""Generate larger-SF analogs of /root/testdata for the scale-slope
measurement (SCALE.md): same schemas and distributions as the driver's
sf0.1 tables (vocab/length/lang/source for documents, N(0, 0.125) dim-64
float32 embeddings, TPC-H-ish lineitem ranges), at 5x and 10x row
counts. Deterministic (numpy seed per table). Output is local test
input only (gitignored) -- the engine under test never depends on this
script. Usage: python3 tools/gen_scaledata.py [outroot]

r16: emits the FULL 11-table star schema (region/nation copied verbatim
from sf0.1 -- fixed dims; customer/supplier/part/orders/events generated
at scale from sf0.1's probed distributions) so the whole Bench suite, not
just the scale-path operators, runs at sf1 (VERDICT r15 #6).
"""
import sys
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = np.array([
    'a', 'agg', 'batch', 'big', 'column', 'customer', 'data', 'dup',
    'fast', 'filter', 'group', 'hash', 'join', 'key', 'line', 'merge',
    'order', 'part', 'query', 'row', 'scan', 'slow', 'small', 'sort',
    'spark', 'stream', 'table', 'the', 'value', 'vector', 'window'])
LANGS = np.array(['en', 'zh', 'es', 'fr', 'de'])
LANG_P = np.array([0.41, 0.15, 0.15, 0.15, 0.14])
SOURCES = np.array([f'src{i}' for i in range(20)])


def gen_documents(n, rng):
    lens = rng.integers(10, 101, size=n)
    texts = []
    for i in range(n):
        words = rng.choice(VOCAB, size=lens[i])
        # plant a near-dup of the previous doc at the same 1%-of-docs
        # rate as the reference corpus (25 pairs / 5000 docs at sf0.1):
        # copy and mutate ~10% of its words
        if i % 200 == 199:
            prev = texts[-1].split(' ')
            k = max(1, len(prev) // 10)
            idx = rng.integers(0, len(prev), size=k)
            for j in idx:
                prev[j] = rng.choice(VOCAB)
            texts.append(' '.join(prev))
        else:
            texts.append(' '.join(words))
    langs = rng.choice(LANGS, size=n, p=LANG_P)
    sources = rng.choice(SOURCES, size=n)
    return pa.table({
        'doc_id': pa.array(range(n), pa.int64()),
        'text': pa.array(texts, pa.string()),
        'lang': pa.array(langs, pa.string()),
        'source': pa.array(sources, pa.string()),
        'n_chars': pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(n, rng):
    dim = 64
    vecs = rng.normal(0.0, 0.125, size=(n, dim)).astype(np.float32)
    return pa.table({
        'vec_id': pa.array(range(n), pa.int64()),
        'embedding': pa.FixedSizeListArray.from_arrays(
            pa.array(vecs.reshape(-1), pa.float32()), dim).cast(
                pa.list_(pa.float32())),
        'label': pa.array(rng.integers(0, 10, size=n), pa.int32()),
    })


def gen_lineitem(n, rng, mult):
    base = np.datetime64('1995-01-02')
    days = rng.integers(0, 2500, size=n)
    qty = rng.integers(1, 51, size=n).astype(np.float64)
    price = rng.uniform(900.0, 105000.0, size=n).round(2)
    return pa.table({
        'l_orderkey': pa.array(rng.integers(0, 150000 * mult, size=n), pa.int64()),
        'l_partkey': pa.array(rng.integers(0, 20000 * mult, size=n), pa.int64()),
        'l_suppkey': pa.array(rng.integers(0, 1000 * mult, size=n), pa.int64()),
        'l_linenumber': pa.array(rng.integers(1, 8, size=n), pa.int32()),
        'l_quantity': pa.array(qty, pa.float64()),
        'l_extendedprice': pa.array(price, pa.float64()),
        'l_discount': pa.array(rng.integers(0, 11, size=n) / 100.0, pa.float64()),
        'l_tax': pa.array(rng.integers(0, 9, size=n) / 100.0, pa.float64()),
        'l_returnflag': pa.array(rng.choice(['A', 'N', 'R'], size=n), pa.string()),
        'l_linestatus': pa.array(rng.choice(['O', 'F'], size=n), pa.string()),
        'l_shipdate': pa.array(base + days, pa.timestamp('us')),
    })


def gen_customer(n, rng):
    return pa.table({
        'c_custkey': pa.array(range(n), pa.int64()),
        'c_name': pa.array([f'Customer#{i:09d}' for i in range(n)], pa.string()),
        'c_nationkey': pa.array(rng.integers(0, 25, size=n), pa.int32()),
        'c_acctbal': pa.array(rng.uniform(-999.99, 9999.99, size=n).round(2),
                              pa.float64()),
        'c_mktsegment': pa.array(rng.choice(
            ['AUTOMOBILE', 'BUILDING', 'FURNITURE', 'HOUSEHOLD', 'MACHINERY'],
            size=n), pa.string()),
    })


def gen_supplier(n, rng):
    return pa.table({
        's_suppkey': pa.array(range(n), pa.int64()),
        's_name': pa.array([f'Supplier#{i:09d}' for i in range(n)], pa.string()),
        's_nationkey': pa.array(rng.integers(0, 25, size=n), pa.int32()),
        's_acctbal': pa.array(rng.uniform(-999.99, 9999.99, size=n).round(2),
                              pa.float64()),
    })


def gen_part(n, rng):
    adjs = ['blue', 'cold', 'hot', 'large', 'new', 'old', 'red', 'small']
    nouns = ['anvil', 'bolt', 'gear', 'gizmo', 'plate', 'ring', 'rod', 'widget']
    names = [f'{rng.choice(adjs)} {rng.choice(nouns)}' for _ in range(n)]
    return pa.table({
        'p_partkey': pa.array(range(n), pa.int64()),
        'p_name': pa.array(names, pa.string()),
        'p_brand': pa.array([f'Brand#{b}' for b in rng.integers(1, 26, size=n)],
                            pa.string()),
        'p_type': pa.array(rng.choice(
            ['ECONOMY', 'LARGE', 'MEDIUM', 'PROMO', 'SMALL', 'STANDARD'],
            size=n), pa.string()),
        'p_size': pa.array(rng.integers(1, 51, size=n), pa.int32()),
        # probed sf0.1 pattern: 900 + (partkey % 1000)/10
        'p_retailprice': pa.array(
            [900.0 + (i % 1000) / 10.0 for i in range(n)], pa.float64()),
    })


def gen_orders(n, ncust, rng):
    base = np.datetime64('1995-01-01')
    days = rng.integers(0, 2404, size=n)  # probed span 1995-01-01..2001-08-01
    return pa.table({
        'o_orderkey': pa.array(range(n), pa.int64()),
        'o_custkey': pa.array(rng.integers(0, ncust, size=n), pa.int64()),
        'o_orderstatus': pa.array(rng.choice(['O', 'P', 'F'], size=n), pa.string()),
        'o_totalprice': pa.array(rng.uniform(1000.0, 500000.0, size=n).round(2),
                                 pa.float64()),
        'o_orderdate': pa.array((base + days).astype('datetime64[us]'),
                                pa.timestamp('us')),
        'o_orderpriority': pa.array(rng.choice(
            ['1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'],
            size=n), pa.string()),
    })


def gen_events(n, nusers, rng):
    # probed sf0.1 shape: ts sorted ascending over one month (uniform
    # arrivals), value ~ Exp(mean 50), props = single-key JSON
    base = np.datetime64('2024-01-01', 'us')
    month_us = 30 * 86400 * 1_000_000
    offs = np.sort(rng.integers(0, month_us, size=n))
    ks = rng.integers(0, 100, size=n)
    return pa.table({
        'event_id': pa.array(range(n), pa.int64()),
        'ts': pa.array(base + offs.astype('timedelta64[us]'), pa.timestamp('us')),
        'user_id': pa.array(rng.integers(0, nusers, size=n), pa.int64()),
        'event_type': pa.array(rng.choice(
            ['click', 'error', 'purchase', 'signup', 'view'], size=n), pa.string()),
        'value': pa.array(rng.exponential(50.0, size=n).round(2), pa.float64()),
        'props': pa.array([f'{{"k": {k}}}' for k in ks], pa.string()),
    })


def main():
    outroot = sys.argv[1] if len(sys.argv) > 1 else '/root/repo/scaledata'
    # r18: optional mult list (e.g. `... scaledata 100` emits only sf10);
    # default keeps the r16 pair so existing invocations are unchanged.
    mults = ([int(a) for a in sys.argv[2:]] if len(sys.argv) > 2
             else [5, 10])
    import os
    import shutil
    for mult in mults:
        name = f'sf{mult/10:g}'
        d = os.path.join(outroot, name)
        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng(1000 + mult)
        pq.write_table(gen_documents(5000 * mult, rng), f'{d}/documents.parquet')
        pq.write_table(gen_embeddings(2000 * mult, rng), f'{d}/embeddings.parquet')
        pq.write_table(gen_lineitem(600000 * mult, rng, mult), f'{d}/lineitem.parquet')
        # fixed dims: copy the driver's own sf0.1 tables verbatim
        for dim in ['region', 'nation']:
            shutil.copyfile(f'/root/testdata/sf0.1/{dim}.parquet',
                            f'{d}/{dim}.parquet')
        pq.write_table(gen_customer(15000 * mult, rng), f'{d}/customer.parquet')
        pq.write_table(gen_supplier(1000 * mult, rng), f'{d}/supplier.parquet')
        pq.write_table(gen_part(20000 * mult, rng), f'{d}/part.parquet')
        pq.write_table(gen_orders(150000 * mult, 15000 * mult, rng),
                       f'{d}/orders.parquet')
        pq.write_table(gen_events(100000 * mult, 1500 * mult, rng),
                       f'{d}/events.parquet')
        print(f'wrote {d}: documents={5000*mult} embeddings={2000*mult} '
              f'lineitem={600000*mult} orders={150000*mult} events={100000*mult}')


if __name__ == '__main__':
    main()
