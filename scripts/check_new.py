"""One-off parity check for newly added queries: python scripts/check_new.py q141 q142 ..."""
import sys
import time

sys.path.insert(0, "/root/repo")

from tests.parity import compare, duckdb_connection  # noqa: E402

SF = "/root/testdata/sf0.01"


def main(prefixes):
    import __spark_entry__ as e
    from spatial_data_engineering_spark.session import build_session

    qs, os_ = e.queries(), e.oracle_sql()
    names = [n for n in qs if any(n.startswith(p) for p in prefixes)]
    spark = build_session()
    duck = duckdb_connection(SF)
    failed = []
    for n in names:
        t0 = time.time()
        try:
            df = qs[n](spark, SF)
            if n in os_:
                compare(df, duck.sql(os_[n]).df(), name=n)
                print(f"PASS  {n}  ({time.time()-t0:.1f}s)")
            else:
                c = df.count()
                print(f"ROWS  {n}  rows={c}  ({time.time()-t0:.1f}s)")
        except Exception as ex:  # noqa: BLE001
            failed.append(n)
            print(f"FAIL  {n}: {str(ex)[:2000]}")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main(sys.argv[1:])
