"""Communication auditing of compiled (SPMD-partitioned) HLO.

SURVEY §7 names the sharded embedding gather/scatter as the main
distributed-performance hazard: GSPMD silently falls back to replicating
an operand (a masked all-reduce or all-gather of the full array) when it
cannot partition an op — a correctness-preserving choice that turns an
O(B) communication into an O(B*W*d) one without any test failing.  This
module extracts every collective from a compiled module so tests can
assert byte budgets (tests/test_sharding.py) and scripts can print
per-collective tables (PERFORMANCE.md).
"""

from __future__ import annotations

import re
from typing import List, NamedTuple

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "bf16": 2, "f16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
}

_COLLECTIVE_RE = re.compile(
    r"\b(all-gather|all-reduce|reduce-scatter|collective-permute|"
    r"all-to-all)\b"
)
# First (or only) shape of the op result, e.g. "f32[320,32]{1,0}" or
# "(f32[2176,16]{1,0}, ...)".
_SHAPE_RE = re.compile(r"=\s*\(?([a-z][a-z0-9]*)\[([\d,]*)\]")


class Collective(NamedTuple):
    op: str
    dtype: str
    shape: tuple  # first result shape (tuple collectives have several)
    bytes: int  # total over every result shape
    line: str
    parts: tuple = ()  # every (dtype, shape, bytes) in the result


def collectives(hlo_text: str) -> List[Collective]:
    """Every collective instruction with its (first) result shape/bytes.

    Tuple-shaped collectives report the first element; the per-element
    get-tuple-elements carry the rest — callers asserting budgets should
    treat the returned bytes as a per-collective lower bound and use
    ``total_bytes`` for the aggregate.
    """
    out = []
    # `%name = <result-shape(s)> <op-name>(operands...)`: take the result
    # shape text strictly between '=' and the collective op name.
    inst = re.compile(
        r"=\s*(?P<shapes>[^=]*?)\s*(?P<op>all-gather|all-reduce|"
        r"reduce-scatter|collective-permute|all-to-all)(?:-start)?\("
    )
    for line in hlo_text.splitlines():
        line = line.strip()
        m = inst.search(line)
        if not m:
            continue
        total = 0
        parts = []
        # Tuple collectives fuse several reductions into one op; sum every
        # result shape.
        for dt, shp in re.findall(
            r"([a-z][a-z0-9]*)\[([\d,]*)\]", m.group("shapes")
        ):
            if dt not in _DTYPE_BYTES:
                continue
            elems = 1
            if shp:
                for x in shp.split(","):
                    elems *= int(x)
            dims = tuple(int(x) for x in shp.split(",")) if shp else ()
            parts.append((dt, dims, elems * _DTYPE_BYTES[dt]))
            total += elems * _DTYPE_BYTES[dt]
        if not parts:
            continue
        out.append(
            Collective(m.group("op"), parts[0][0], parts[0][1], total,
                       line, tuple(parts))
        )
    return out


def total_bytes(hlo_text: str) -> int:
    return sum(c.bytes for c in collectives(hlo_text))


def max_collective_bytes(hlo_text: str) -> int:
    cs = collectives(hlo_text)
    return max((c.bytes for c in cs), default=0)


def format_table(hlo_text: str, top: int = 20) -> str:
    cs = sorted(collectives(hlo_text), key=lambda c: -c.bytes)[:top]
    lines = [
        f"{c.bytes:10d} B  {c.op:20s} {c.dtype}[{','.join(map(str, c.shape))}]"
        for c in cs
    ]
    lines.append(f"{total_bytes(hlo_text):10d} B  TOTAL per step")
    return "\n".join(lines)
