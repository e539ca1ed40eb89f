"""Property-based fuzz of utils/proto_wire.py (seeded, deterministic).

Two properties the hand-pinned tests in test_upgrade_binary.py cannot
cover exhaustively:

1. **Round-trip**: any schema-conforming dict survives
   encode -> decode unchanged (up to the codec's documented
   canonicalisations: enums come back as NAME strings, floats are
   float32-rounded, singleton lists collapse to scalars — the same
   shape `parse_prototxt` produces).
2. **Robustness**: the decoder never hangs and only raises from a
   small known exception set on arbitrary byte garbage (a truncated /
   corrupted .caffemodel must not take the process down in an
   uncontrolled way — net.cpp:741's ReadProtoFromBinaryFile likewise
   CHECK-fails cleanly on parse errors).
"""

import random
import string
import struct

from mms_answer_selection_tpu.utils.proto_wire import (
    _SCHEMAS, _decode, _encode, decode_net_binary, encode_net_binary)

# Messages where a field number is decode-only legacy (V1Layer/V0Layer
# appear under NetParameter's legacy 'layers'/'layer' numbers and are
# never re-encoded by the tool) still must individually round-trip:
# the encoder supports every schema table symmetrically.
_ALL_MESSAGES = sorted(_SCHEMAS)

# NetParameter itself: 'layers' (V1) is rejected by encode_net_binary
# by design; fuzz the public API without it.
_NET_SKIP_FIELDS = {"layers"}


def _f32(x):
    return float(struct.unpack("<f", struct.pack("<f", x))[0])


def _rand_scalar(rng, kind, depth):
    if kind == "i" or kind == "pi":
        # bias toward small values but include negatives + 64-bit edges
        return rng.choice([
            rng.randrange(0, 16),
            rng.randrange(-8, 8),
            rng.randrange(-(1 << 31), 1 << 31),
            (1 << 62) + rng.randrange(0, 4),
        ])
    if kind == "b":
        return rng.random() < 0.5
    if kind in ("f", "pf"):
        return _f32(rng.uniform(-1e6, 1e6))
    if kind == "s":
        n = rng.randrange(0, 12)
        return "".join(rng.choice(string.printable[:94]) for _ in range(n))
    if kind == "B":
        return bytes(rng.randrange(256) for _ in range(rng.randrange(0, 20)))
    if kind[0] == "e":
        return rng.choice(sorted(kind[1].values()))
    if kind[0] == "m":
        return _rand_message(rng, kind[1], depth + 1)
    raise AssertionError(kind)


def _rand_message(rng, msg, depth=0):
    tbl = _SCHEMAS[msg]
    out = {}
    # at depth>2 keep messages small so Net->Layer->sub-msg->Filler
    # trees stay shallow and fast
    max_fields = 6 if depth < 2 else 2
    numbers = sorted(tbl)
    rng.shuffle(numbers)
    for num in numbers[:rng.randrange(0, max_fields + 1)]:
        name, kind = tbl[num]
        if msg == "Net" and name in _NET_SKIP_FIELDS:
            continue
        if rng.random() < 0.3:  # repeated
            vals = [_rand_scalar(rng, kind, depth)
                    for _ in range(rng.randrange(2, 4))]
            out[name] = vals
        else:
            out[name] = _rand_scalar(rng, kind, depth)
    return out


def _normalize(v):
    """Collapse singleton lists (the decoder stores the first occurrence
    of a field as a scalar) and canonicalise bools (decode yields bool
    for 'b' kinds; the generator already uses bool)."""
    if isinstance(v, dict):
        return {k: _normalize(x) for k, x in v.items()}
    if isinstance(v, list):
        if len(v) == 1:
            return _normalize(v[0])
        return [_normalize(x) for x in v]
    return v


def test_roundtrip_every_message_table():
    rng = random.Random(0xC0FFEE)
    for msg in _ALL_MESSAGES:
        for _ in range(40):
            d = _rand_message(rng, msg)
            wire = _encode(d, msg)
            back = _decode(wire, msg)
            assert _normalize(back) == _normalize(d), (msg, d, back)


def test_roundtrip_public_net_api():
    rng = random.Random(1234)
    for _ in range(60):
        d = _rand_message(rng, "Net")
        wire = encode_net_binary(d)
        back = decode_net_binary(wire)
        assert _normalize(back) == _normalize(d)


def test_decoder_survives_garbage():
    rng = random.Random(99)
    allowed = (ValueError, IndexError, struct.error, OverflowError)
    for _ in range(500):
        n = rng.randrange(0, 64)
        blob = bytes(rng.randrange(256) for _ in range(n))
        try:
            decode_net_binary(blob)
        except allowed:
            pass  # controlled failure is fine; hangs/segfaults are not


def test_decoder_survives_truncations():
    """Every prefix of a valid wire message decodes or fails cleanly."""
    rng = random.Random(7)
    d = _rand_message(rng, "Net")
    wire = encode_net_binary(d)
    allowed = (ValueError, IndexError, struct.error, OverflowError)
    for cut in range(len(wire)):
        try:
            decode_net_binary(wire[:cut])
        except allowed:
            pass
