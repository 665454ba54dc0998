"""From-scratch XSpace (.xplane.pb) parser: per-op device time table.

tensorboard_plugin_profile's native converter is unusable in this
environment (its pywrap symbol is missing), so this decodes the trace
protobuf directly — same minimal-proto approach as the checkpoint
reader in monopsr_tpu/tools/convert_tf_resnet.py. Field numbers follow
tensorflow/tsl/profiler/protobuf/xplane.proto:

  XSpace.planes=1; XPlane{id=1,name=2,lines=3,event_metadata=4,
  stat_metadata=5}; XLine{name=2,events=4}; XEvent{metadata_id=1,
  offset_ps=2,duration_ps=3,stats=4}; XEventMetadata{id=1,name=2,
  stats=5}; XStat{metadata_id=1,double=2,uint64=3,int64=4,str=5};
  XStatMetadata{id=1,name=2}.

Usage:
    python scripts/xplane_ops.py <trace.xplane.pb|trace_dir> [topk]

Prints, for each device plane, total XLA-op time and the top-k ops by
accumulated duration, with their HLO category and per-op occurrence
counts; then a rollup by category.
"""

import collections
import glob
import os
import struct
import sys


def _read_varint(buf, pos):
    result = 0
    shift = 0
    while True:
        byte = buf[pos]
        pos += 1
        result |= (byte & 0x7f) << shift
        if not byte & 0x80:
            return result, pos
        shift += 7


def parse_fields(buf):
    """{field: [raw values]} for one message (varint/fixed/bytes)."""
    fields = collections.defaultdict(list)
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            value, pos = _read_varint(buf, pos)
        elif wire == 1:
            value = struct.unpack('<Q', buf[pos:pos + 8])[0]
            pos += 8
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            value = bytes(buf[pos:pos + length])
            pos += length
        elif wire == 5:
            value = struct.unpack('<I', buf[pos:pos + 4])[0]
            pos += 4
        else:
            raise ValueError('wire type %d' % wire)
        fields[field].append(value)
    return fields


def _map_entry(raw):
    """proto map entry: key=1 (varint), value=2 (message bytes)."""
    f = parse_fields(raw)
    return f[1][0], f[2][0]


def plane_tables(plane_raw):
    """-> (plane_name, {line_name: [(op_name, category, dur_ps)]})."""
    plane = parse_fields(plane_raw)
    name = plane[2][0].decode('utf-8', 'replace') if 2 in plane else '?'

    stat_names = {}
    for raw in plane.get(5, []):
        k, v = _map_entry(raw)
        meta = parse_fields(v)
        stat_names[k] = (meta[2][0].decode('utf-8', 'replace')
                        if 2 in meta else str(k))

    event_meta = {}
    for raw in plane.get(4, []):
        k, v = _map_entry(raw)
        meta = parse_fields(v)
        ev_name = (meta[2][0].decode('utf-8', 'replace')
                   if 2 in meta else str(k))
        category = ''
        for stat_raw in meta.get(5, []):
            st = parse_fields(stat_raw)
            sname = stat_names.get(st[1][0] if 1 in st else -1, '')
            if sname == 'hlo_category' and 5 in st:
                category = st[5][0].decode('utf-8', 'replace')
        event_meta[k] = (ev_name, category)

    lines = {}
    for line_raw in plane.get(3, []):
        line = parse_fields(line_raw)
        lname = (line[2][0].decode('utf-8', 'replace')
                 if 2 in line else '?')
        rows = []
        for ev_raw in line.get(4, []):
            ev = parse_fields(ev_raw)
            mid = ev[1][0] if 1 in ev else -1
            dur = ev[3][0] if 3 in ev else 0
            ev_name, cat = event_meta.get(mid, (str(mid), ''))
            rows.append((ev_name, cat, dur))
        lines.setdefault(lname, []).extend(rows)
    return name, lines


def main():
    path = sys.argv[1]
    topk = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    if os.path.isdir(path):
        candidates = sorted(
            glob.glob(os.path.join(path, '**', '*.xplane.pb'),
                      recursive=True))
        assert candidates, 'no .xplane.pb under ' + path
        path = candidates[-1]
    with open(path, 'rb') as f:
        space = parse_fields(f.read())

    for plane_raw in space.get(1, []):
        name, lines = plane_tables(plane_raw)
        if 'TPU' not in name and 'device' not in name.lower():
            continue
        for lname, rows in lines.items():
            if lname != 'XLA Ops' or not rows:
                continue
            per_op = collections.defaultdict(lambda: [0, 0, ''])
            for op, cat, dur in rows:
                per_op[op][0] += dur
                per_op[op][1] += 1
                per_op[op][2] = cat
            total = sum(v[0] for v in per_op.values())
            print('\n=== %s / %s: %.3f ms total XLA-op time ===' %
                  (name, lname, total / 1e9))
            ranked = sorted(per_op.items(), key=lambda kv: -kv[1][0])
            for op, (dur, cnt, cat) in ranked[:topk]:
                print('%5.1f%% %9.3f ms %5dx %-14.14s %s' %
                      (100.0 * dur / total, dur / 1e9, cnt, cat,
                       op[:95]))
            by_cat = collections.defaultdict(int)
            for op, (dur, cnt, cat) in per_op.items():
                by_cat[cat or '?'] += dur
            print('--- by category ---')
            for cat, dur in sorted(by_cat.items(), key=lambda kv: -kv[1]):
                print('%5.1f%% %9.3f ms  %s' %
                      (100.0 * dur / total, dur / 1e9, cat))


if __name__ == '__main__':
    main()
