"""One-shot codemod: make all rounding parity-safe in plans/*.py.

SQL strings:  ROUND(<expr>, <n>)  ->  CAST(ROUND(CAST(<expr> AS DECIMAL(38,9)), <n>) AS DOUBLE)
Spark code:   F.round(<expr>, <n>).alias -> r(<expr>, <n>).alias  (via import from .base)
"""

import re
import sys


def rewrite_sql_rounds(text: str) -> str:
    out = []
    i = 0
    while True:
        m = re.compile(r"ROUND\(").search(text, i)
        if not m:
            out.append(text[i:])
            break
        out.append(text[i : m.start()])
        # find balanced closing paren
        depth = 1
        j = m.end()
        while depth:
            if text[j] == "(":
                depth += 1
            elif text[j] == ")":
                depth -= 1
            j += 1
        inner = text[m.end() : j - 1]
        # split on last top-level comma -> (expr, n)
        depth = 0
        split = None
        for k, ch in enumerate(inner):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                split = k
        expr, n = inner[:split], inner[split + 1 :].strip()
        out.append(f"CAST(ROUND(CAST({expr} AS DECIMAL(38,9)), {n}) AS DOUBLE)")
        i = j
    return "".join(out)


def rewrite_spark_rounds(text: str) -> str:
    out = []
    i = 0
    while True:
        idx = text.find("F.round(", i)
        if idx < 0:
            out.append(text[i:])
            break
        out.append(text[i:idx])
        depth = 1
        j = idx + len("F.round(")
        while depth:
            if text[j] == "(":
                depth += 1
            elif text[j] == ")":
                depth -= 1
            j += 1
        inner = text[idx + len("F.round(") : j - 1]
        out.append(f"r({inner})")
        i = j
    return "".join(out)


for path in sys.argv[1:]:
    src = open(path).read()
    # only rewrite ROUND inside triple-quoted SQL strings; approximation:
    # rewrite everywhere (ROUND( appears only in SQL, F.round( only in code)
    src = rewrite_sql_rounds(src)
    src = rewrite_spark_rounds(src)
    if "from .base import" in src and " r" not in src.split("from .base import", 1)[1].split("\n", 1)[0]:
        src = src.replace("from .base import Query", "from .base import Query, r")
    open(path, "w").write(src)
    print(f"rewrote {path}")
