#!/usr/bin/env python3
"""Generate larger-SF analogs of /root/testdata for the scale-slope
measurement (SCALE.md): same schemas and distributions as the driver's
sf0.1 tables (vocab/length/lang/source for documents, N(0, 0.125) dim-64
float32 embeddings, TPC-H-ish lineitem ranges), at 5x and 10x row
counts. Deterministic (numpy seed per table). Output is local test
input only (gitignored) -- the engine under test never depends on this
script. Usage: python3 tools/gen_scaledata.py [outroot]
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


def main():
    outroot = sys.argv[1] if len(sys.argv) > 1 else '/root/repo/scaledata'
    import os
    for mult, name in [(5, 'sf0.5'), (10, 'sf1')]:
        d = os.path.join(outroot, name)
        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng(1000 + mult)
        pq.write_table(gen_documents(5000 * mult, rng), f'{d}/documents.parquet')
        pq.write_table(gen_embeddings(2000 * mult, rng), f'{d}/embeddings.parquet')
        pq.write_table(gen_lineitem(600000 * mult, rng, mult), f'{d}/lineitem.parquet')
        print(f'wrote {d}: documents={5000*mult} embeddings={2000*mult} lineitem={600000*mult}')


if __name__ == '__main__':
    main()
