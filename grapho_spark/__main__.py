"""Interactive GQL REPL — the driver-side equivalent of the
reference's TCP server + client CLI (server/server.go:41-159,
cmd/client/main.go): statements accumulate until a line ends with
``;``, ``quit``/``exit`` leaves, results print as DataFrames instead
of scraped printf text.

Usage:  python -m grapho_spark [--data-dir DIR]
"""

from __future__ import annotations

import argparse
import sys


def main() -> int:
    ap = argparse.ArgumentParser(prog="grapho_spark")
    ap.add_argument("--data-dir", default=None, help="durable catalog/commit-log dir")
    ap.add_argument(
        "--script", default=None, help="execute a GQL script file and exit"
    )
    ap.add_argument(
        "--serve",
        type=int,
        default=None,
        metavar="PORT",
        help="run the TCP line server (reference wire protocol) instead of the REPL",
    )
    args = ap.parse_args()

    from grapho_spark.engine import GraphEngine
    from grapho_spark.engine.engine import EngineError
    from grapho_spark.session import get_spark

    spark = get_spark("grapho_spark_repl")
    engine = GraphEngine(spark, data_dir=args.data_dir)

    def run(script: str) -> None:
        try:
            for res in engine.execute(script):
                if res.df is not None:
                    res.df.show(50, truncate=False)
                else:
                    print(res.message)
        except EngineError as e:
            print(f"error: {e}", file=sys.stderr)

    if args.serve is not None:
        import asyncio

        from grapho_spark.server import GQLServer

        srv = GQLServer(engine, host="0.0.0.0", port=args.serve)
        print(f"grapho-spark GQL server listening on :{args.serve}")
        try:
            asyncio.run(srv.serve())
        except KeyboardInterrupt:
            pass
        engine.flush()
        return 0

    if args.script:
        with open(args.script, encoding="utf-8") as f:
            run(f.read())
        engine.flush()
        return 0

    print("grapho-spark GQL REPL — statements end with ';', 'quit' to exit")
    buffer: list[str] = []
    while True:
        try:
            prompt = "gql> " if not buffer else "...> "
            line = input(prompt)
        except EOFError:
            break
        if not buffer and line.strip().lower() in ("quit", "exit"):
            break
        buffer.append(line)
        # statements accumulate until a line ends with ';'
        # (server/server.go:146-151)
        if line.rstrip().endswith(";"):
            run("\n".join(buffer))
            buffer = []
    engine.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
