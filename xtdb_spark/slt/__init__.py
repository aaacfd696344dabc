"""sqllogictest (SLT) harness.

The reference treats the public sqllogictest corpus (its
`sqlite-test/` tree, ~3.3M queries) as its main SQL-correctness
battery, run by src/test/clojure/xtdb/sql/logic_test/runner.clj with
an engine adapter in xtdb_engine.clj and per-directory error budgets
in .github/workflows/slt.yml:14-27 plus two PR-gate tiers in
build.gradle.kts:722-748 (`slt-test`, `slt-test-2`).

This package is the Spark-side equivalent: `parser` reads the SLT
format (a public format — https://sqlite.org/sqllogictest), `runner`
executes records through XtdbSession.sql against a real TableStore
(DML ingests via the tx path, exactly like the reference adapter's
put-docs), and formats/compares results with the reference runner's
exact rules (runner.clj:204-227 format-result-str + md5).
"""

from xtdb_spark.slt.parser import parse_script
from xtdb_spark.slt.runner import run_script, run_files

__all__ = ["parse_script", "run_script", "run_files"]
