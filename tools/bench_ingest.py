"""CNPJ ingest throughput bench — the direct comparable to the
reference's anchor (~1 GB CSV → Parquet in ≤480 s per 9 GB Lambda,
≥2.2 MB/s/worker; BASELINE.md).

Generates N MB of synthetic empresas-dialect CSV (latin-1, ';',
decimal comma), then times read_cnpj_csv → write_snapshot →
register_table end-to-end.

Usage: python tools/bench_ingest.py [mb]
"""

from __future__ import annotations

import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NAMES = ["AÇAÍ DO NORTE", "SÃO PAULO COMÉRCIO", "PADARIA ESTRELA", "TRANSPORTES JOSÉ"]
UFS = ["SP", "AM", "RJ", "MG", "PR"]


def make_csv(path: str, target_mb: int) -> int:
    rng = random.Random(42)
    target = target_mb * 1024 * 1024
    written = 0
    with open(path, "w", encoding="latin-1") as f:
        i = 0
        while written < target:
            row = (
                f"{10000000 + i};{rng.choice(NAMES)} {i} LTDA;{rng.randint(1000, 9999)};"
                f"{rng.randint(1, 99)};{rng.randint(0, 10_000_000)},{rng.randint(0, 99):02d};"
                f"{rng.randint(1, 5)};{rng.choice(UFS)}\n"
            )
            written += len(row)
            f.write(row)
            i += 1
    return i


def main() -> None:
    from aws_etl_dados_publicos_cnpj_spark.session import build_session
    from aws_etl_dados_publicos_cnpj_spark.sources.cnpj_csv import read_cnpj_csv
    from aws_etl_dados_publicos_cnpj_spark.sources.sink import register_table, write_snapshot

    mb = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    tmp = tempfile.mkdtemp()
    csv_path = os.path.join(tmp, "Empresas0.csv")
    n_rows = make_csv(csv_path, mb)
    actual_mb = os.path.getsize(csv_path) / 1e6

    spark = build_session("bench-ingest", extra_conf={"spark.ui.showConsoleProgress": "false"})
    root = os.path.join(tmp, "wh", "empresas")
    start = time.perf_counter()
    df = read_cnpj_csv(spark, [csv_path], "empresas")
    write_snapshot(df, root, "20230506")
    register_table(spark, "bench_empresas", root)
    elapsed = time.perf_counter() - start
    out_rows = spark.sql("SELECT count(*) AS n FROM bench_empresas").collect()[0].n
    assert out_rows == n_rows, (out_rows, n_rows)
    print(
        json.dumps(
            {
                "metric": "cnpj_ingest_throughput",
                "value": round(actual_mb / elapsed, 2),
                "unit": "MB/s",
                "csv_mb": round(actual_mb, 1),
                "rows": n_rows,
                "wall_s": round(elapsed, 2),
                "baseline_mb_s": 2.2,
            }
        )
    )
    spark.sql("DROP TABLE bench_empresas")
    spark.stop()


if __name__ == "__main__":
    main()
