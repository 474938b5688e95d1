"""Interactive SQL REPL — parity with the reference CLI
(/root/reference/cli/src/main.rs): a `llamadb> ` prompt that accepts
llamadb-dialect SQL, plus the `testdata` command (loads the Chinook
subset like the reference, and registers the driver's TPC-H-ish
parquet tables as a bonus).

Usage:  python cli.py [sf_dir]    (default /root/testdata/sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    from llamadb_spark.session import get_spark, register_views
    from llamadb_spark.sql import LlamaSession
    from llamadb_spark.sql.dialect import LlamaError

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("llamadb-cli")
    spark.sparkContext.setLogLevel("ERROR")
    db = LlamaSession(spark)
    print("llamadb_spark CLI — Ctrl+D to exit")

    buf: list[str] = []
    while True:
        try:
            line = input("llamadb> " if not buf else "     ..> ")
        except EOFError:
            print()
            break
        buf.append(line)
        joined = " ".join(buf).strip()
        if not joined:
            buf = []
            continue
        if joined.lower() == "testdata":
            from llamadb_spark.sql.testdata import load_chinook

            n = load_chinook(db)
            register_views(spark, sf_dir)
            print(
                f"loaded Chinook subset ({n} statements); "
                f"registered TPC-H-ish views from {sf_dir}"
            )
            buf = []
            continue
        if not joined.endswith(";") and not joined.lower().startswith("explain"):
            continue  # keep buffering until ';'
        buf = []
        try:
            if joined.lower().startswith("explain"):
                print(db.explain(joined))
            else:
                out = db.execute(joined)
                if out is not None:
                    from llamadb_spark.sql.pretty import pretty_select

                    # reference-format table (prettyselect.rs parity,
                    # 32-row pages like cli/src/main.rs:108); a CLI
                    # result set is user-bounded, so collect() is the
                    # same full iteration the reference performs
                    text, n = pretty_select(out.columns, out.collect())
                    print(text)
                    print(f"{n} rows selected.")
        except LlamaError as exc:
            print(f"error: {exc}")
        except Exception as exc:  # noqa: BLE001
            print(f"error: {str(exc).splitlines()[0]}")


if __name__ == "__main__":
    main()
