#!/usr/bin/env python3
"""Independent GIF87a LZW reference decoder (dev tooling only).

Implements the canonical GIF LZW decode rules from scratch (LSB-first
sub-block bit stream, clear/EOI codes, width growth when the next free
entry reaches 2^width - 1, cScSc handling) WITHOUT looking at the Scala
implementation — used as a second opinion that graft.operators.Gif
emodes standard-conformant streams (no PIL in this container).

Usage: python3 scripts/gif_ref_decode.py <file.gif> <expected_id>
Exits 0 iff pixels == (id*31 + i*7) % 256 for all i.
"""
import sys

def decode(path, ident):
    b = open(path, 'rb').read()
    assert b[:6] in (b'GIF87a', b'GIF89a'), 'signature'
    flags = b[10]
    pos = 13
    if flags & 0x80:
        pos += 3 * (1 << ((flags & 7) + 1))
    while b[pos] != 0x2C:
        assert b[pos] == 0x21, 'extension expected'
        pos += 2
        while b[pos]:
            pos += b[pos] + 1
        pos += 1
    w = b[pos+5] | (b[pos+6] << 8)
    h = b[pos+7] | (b[pos+8] << 8)
    pos += 10
    mcs = b[pos]; pos += 1
    assert mcs == 8, 'min code size'
    # gather sub-blocks
    data = bytearray()
    while b[pos]:
        n = b[pos]; pos += 1
        data += b[pos:pos+n]; pos += n
    # LSB-first bit reader
    acc = 0; nbits = 0; dp = 0
    CLEAR, EOI = 256, 257
    width = 9
    table = {i: bytes([i]) for i in range(256)}
    next_code = 258
    prev = None
    out = bytearray()
    while True:
        while nbits < width:
            acc |= data[dp] << nbits; dp += 1; nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width; nbits -= width
        if code == CLEAR:
            table = {i: bytes([i]) for i in range(256)}
            next_code = 258; width = 9; prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            out += table[code]
        else:
            if code in table:
                entry = table[code]
            elif code == next_code:
                entry = table[prev] + table[prev][:1]
            else:
                raise AssertionError('bad code')
            out += entry
            if next_code <= 4095:
                table[next_code] = table[prev] + entry[:1]
                next_code += 1
                if next_code == (1 << width) - 1 and width < 12:
                    width += 1
        prev = code
    assert len(out) == w * h, f'{len(out)} != {w*h}'
    for i, px in enumerate(out):
        exp = (ident * 31 + i * 7) % 256
        assert px == exp, f'pixel {i}: {px} != {exp}'
    print(f'OK {w}x{h} id={ident}')

if __name__ == '__main__':
    decode(sys.argv[1], int(sys.argv[2]))
