"""Pure-Python algorithm core — ZERO Spark imports.

Shared verbatim by the distributed Arrow kernels
(``..operators.extract`` / ``..operators.score``) and the single-process
parity oracle (``oracle/run_oracle.py``), so extracted text is
byte-identical between the two by construction (BASELINE.json:14
"byte-identical extracted text per url").
"""
