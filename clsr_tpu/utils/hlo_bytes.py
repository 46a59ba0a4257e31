"""Collective-byte accounting from compiled HLO (VERDICT r3 item 4).

Walks a compiled sharded program's HLO text, extracts every collective
op with its payload shape and replica groups, and converts them to
per-device wire bytes under the standard ring-algorithm cost model
(the public scaling-book accounting):

  all-gather      recv = out_bytes * (g-1)/g   per device
  all-reduce      recv = 2 * in_bytes * (g-1)/g (reduce-scatter+gather)
  reduce-scatter  recv = in_bytes  * (g-1)/g
  all-to-all      recv = in_bytes  * (g-1)/g
  collective-permute  recv = in_bytes

Groups are classified against the (data, model) mesh's device order
(data-major, parallel/mesh.py:make_mesh): consecutive-id groups of size
m are 'model'-axis collectives, stride-m groups of size d are 'data',
full-span groups are 'both'.  The scaling model
(scripts/scaling_model.py) maps 'data'/'both' collectives onto the
cross-host boundary when the data axis spans hosts (process-major
order, parallel/distributed.py).

Each collective is tagged with its computation and whether that
computation is reachable from a `conditional` branch (bytes move only
on branch-taken steps — e.g. the owner merge's lossless overflow
fallback, lazy_adam.py) or from a `while` body (bytes move once per
loop iteration — XLA hoists the dense weight-grad all-reduce into the
RNN scan body, so loop collectives get an L multiplier).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Dict, List

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1,
}

_OPS = ("all-gather", "all-reduce", "reduce-scatter", "all-to-all",
        "collective-permute")
_COLL_RE = re.compile(
    r"= (?P<type>\([^=]*?\)|\S+?) "
    r"(?P<op>" + "|".join(_OPS) + r")(?:-start)?\(")
_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")
_COMP_RE = re.compile(r"^(?:ENTRY )?%?([\w.\-]+) \(.*\{\s*$")


def _buffer_bytes(type_str: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        if dt not in _DTYPE_BYTES:
            continue   # token / opaque / layout annotations
        n = 1
        if dims:
            for d in dims.split(","):
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def _groups(line: str, n_dev: int) -> List[List[int]]:
    m = re.search(r"replica_groups=\{(\{[\d,{} ]*\})\}", line)
    if m:
        return [[int(x) for x in g.split(",")] if g else []
                for g in re.findall(r"\{([\d, ]*)\}", m.group(1))]
    # iota v2 form: replica_groups=[rows,cols]<=[dims...](T(perm))?
    m = re.search(r"replica_groups=\[(\d+),(\d+)\]<=\[([\d,]+)\]"
                  r"(T\(([\d,]+)\))?", line)
    if m:
        rows, cols = int(m.group(1)), int(m.group(2))
        dims = [int(x) for x in m.group(3).split(",")]
        import numpy as np
        ids = np.arange(int(np.prod(dims))).reshape(dims)
        if m.group(5):
            perm = [int(x) for x in m.group(5).split(",")]
            ids = ids.transpose(perm)
        return ids.reshape(rows, cols).tolist()
    return [list(range(n_dev))]


@dataclass
class Collective:
    op: str
    payload: int            # input-side buffer bytes (summed over tuple)
    group: List[int]
    n_groups: int
    axis: str               # 'model' | 'data' | 'both' | 'unknown'
    per_device_bytes: float
    computation: str
    in_cond: bool
    in_loop: bool


def classify_axis(group: List[int], d: int, m: int) -> str:
    g = sorted(group)
    if len(g) == d * m:
        return "both"
    if len(g) == m and g == list(range(g[0], g[0] + m)) and g[0] % m == 0:
        return "model"
    if len(g) == d and all((b - a) == m for a, b in zip(g, g[1:])):
        return "data"
    return "unknown"


def _tag_computations(text: str):
    """(cond_reachable, loop_reachable) sets of computation names."""
    calls: Dict[str, List[str]] = {}
    cond_roots, loop_roots = set(), set()
    cur = None
    for line in text.splitlines():
        mh = _COMP_RE.match(line)
        if mh:
            cur = mh.group(1)
            calls.setdefault(cur, [])
            continue
        if cur is None:
            continue
        for attr in re.finditer(
                r"(?:calls|to_apply|body|condition)=%?([\w.\-]+)", line):
            calls[cur].append(attr.group(1))
        mb = re.search(r"branch_computations=\{([^}]*)\}", line)
        if mb:
            for nm in mb.group(1).split(","):
                nm = nm.strip().lstrip("%")
                cond_roots.add(nm)
                calls[cur].append(nm)
        if re.search(r" while\(", line):
            wb = re.search(r"body=%?([\w.\-]+)", line)
            if wb:
                loop_roots.add(wb.group(1))

    def closure(roots):
        reach = set(roots)
        frontier = list(roots)
        while frontier:
            c = frontier.pop()
            for callee in calls.get(c, []):
                if callee not in reach:
                    reach.add(callee)
                    frontier.append(callee)
        return reach

    return closure(cond_roots), closure(loop_roots)


def collect_collectives(hlo_text: str, d: int, m: int) -> List[Collective]:
    cond_set, loop_set = _tag_computations(hlo_text)
    out: List[Collective] = []
    cur = "?"
    for line in hlo_text.splitlines():
        mh = _COMP_RE.match(line)
        if mh:
            cur = mh.group(1)
            continue
        mo = _COLL_RE.search(line)
        if not mo:
            continue
        op = mo.group("op")
        payload = _buffer_bytes(mo.group("type"))
        if op == "reduce-scatter":
            # cost model wants INPUT bytes; output is input/g
            in_bytes = _buffer_bytes(line[mo.end():].split(")")[0])
            if in_bytes:
                payload = in_bytes
        groups = _groups(line, d * m)
        group0 = next((g for g in groups if g), list(range(d * m)))
        g = max(1, len(group0))
        if op == "all-gather":
            per_dev = payload * (g - 1) / g
        elif op == "all-reduce":
            per_dev = 2 * payload * (g - 1) / g
        elif op in ("reduce-scatter", "all-to-all"):
            per_dev = payload * (g - 1) / g
        else:
            per_dev = payload
        out.append(Collective(
            op=op, payload=payload, group=group0, n_groups=len(groups),
            axis=classify_axis(group0, d, m), per_device_bytes=per_dev,
            computation=cur, in_cond=cur in cond_set,
            in_loop=cur in loop_set))
    return out


def summarize(colls: List[Collective], loop_multiplier: float = 1.0,
              include_cond: bool = False) -> Dict[str, float]:
    """Per-device wire bytes per step, keyed 'op/axis' + 'axis/<axis>'
    + 'total'.  Loop-body collectives are scaled by loop_multiplier
    (the RNN scan trip count L); conditional-branch collectives are
    excluded unless include_cond."""
    out: Dict[str, float] = {}
    for c in colls:
        if c.in_cond and not include_cond:
            continue
        b = c.per_device_bytes * (loop_multiplier if c.in_loop else 1.0)
        for key in (f"{c.op}/{c.axis}", f"axis/{c.axis}", "total"):
            out[key] = out.get(key, 0.0) + b
    return out
