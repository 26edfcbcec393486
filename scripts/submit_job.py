"""spark-submit entrypoint (the north rule's deployment shape).

spark-submit runs a script file, not ``-m`` modules, so this thin shim is
the submitted app; the engine itself arrives via ``--py-files engine.zip``
(built by scripts/make_pyfiles.py)::

    spark-submit --master <cluster-or-local[N]> --py-files engine.zip \
        scripts/submit_job.py spec.json --table <parquet-or-iceberg> \
        --out <dir> [--checkpoint <dir>] [--ref-table NAME=PATH ...]

All argument handling lives in json_to_avro_schema_spark.__main__.main;
the submitted --master/--conf win over the engine's local-mode defaults
(session.get_spark detects the spark-submit gateway).
"""

import sys

from json_to_avro_schema_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main())
