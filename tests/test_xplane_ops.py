"""scripts/xplane_ops.py parser vs a hand-encoded XSpace protobuf.

The parser reads profiler traces with a from-scratch proto decoder
(the tensorboard plugin's native converter is broken in this env);
this builds a tiny XSpace wire-format message by hand — one TPU device
plane, stat/event metadata maps, an 'XLA Ops' line with events — and
asserts the decoded tables."""

import importlib.util
import os
import struct

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
spec = importlib.util.spec_from_file_location(
    'xplane_ops', os.path.join(REPO, 'scripts', 'xplane_ops.py'))
xplane_ops = importlib.util.module_from_spec(spec)
spec.loader.exec_module(xplane_ops)


def _varint(v):
    out = b''
    while True:
        byte = v & 0x7f
        v >>= 7
        if v:
            out += bytes([byte | 0x80])
        else:
            return out + bytes([byte])


def _field(num, wire, payload):
    return _varint((num << 3) | wire) + payload


def _msg(num, body):
    return _field(num, 2, _varint(len(body)) + body)


def _map_entry(num, key, value_msg):
    body = _field(1, 0, _varint(key)) + _msg(2, value_msg)
    return _msg(num, body)


def _xstat(metadata_id, str_value=None):
    body = _field(1, 0, _varint(metadata_id))
    if str_value is not None:
        body += _msg(5, str_value.encode())
    return body


def _event(metadata_id, dur_ps):
    return (_field(1, 0, _varint(metadata_id)) +
            _field(3, 0, _varint(dur_ps)))


def build_space():
    # stat metadata: id 7 -> 'hlo_category'
    stat_meta = (_field(1, 0, _varint(7)) + _msg(2, b'hlo_category'))
    # event metadata: id 1 -> fusion.1 (category 'convolution fusion'),
    # id 2 -> copy.3 (category 'data formatting')
    ev1 = (_field(1, 0, _varint(1)) + _msg(2, b'%fusion.1') +
           _msg(5, _xstat(7, 'convolution fusion')))
    ev2 = (_field(1, 0, _varint(2)) + _msg(2, b'%copy.3') +
           _msg(5, _xstat(7, 'data formatting')))
    # line 'XLA Ops' with three events (fusion.1 twice)
    line = (_msg(2, b'XLA Ops') +
            _msg(4, _event(1, 1000)) +
            _msg(4, _event(1, 500)) +
            _msg(4, _event(2, 250)))
    plane = (_msg(2, b'/device:TPU:0') +
             _msg(3, line) +
             _map_entry(4, 1, ev1) +
             _map_entry(4, 2, ev2) +
             _map_entry(5, 7, stat_meta))
    return _msg(1, plane)


def test_parse_hand_encoded_xspace():
    space = xplane_ops.parse_fields(build_space())
    assert 1 in space and len(space[1]) == 1

    name, lines = xplane_ops.plane_tables(space[1][0])
    assert name == '/device:TPU:0'
    rows = lines['XLA Ops']
    assert sorted(rows) == [
        ('%copy.3', 'data formatting', 250),
        ('%fusion.1', 'convolution fusion', 500),
        ('%fusion.1', 'convolution fusion', 1000),
    ]


def test_varint_roundtrip_multibyte():
    buf = _varint(300) + _varint(1)
    v1, pos = xplane_ops._read_varint(buf, 0)
    v2, pos = xplane_ops._read_varint(buf, pos)
    assert (v1, v2) == (300, 1)
    assert pos == len(buf)
