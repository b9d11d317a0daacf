"""Test-only MP3/Ogg-Vorbis encoders binding the system codecs.

The framework itself only *decodes* lossy formats (data/mp3.py,
data/oggvorbis.py); these encoders exist so tests can build controlled
fixtures and prove the decode path without shipping binary blobs. They
bind libmp3lame / libvorbisenc, which are independent codebases from the
decoders under test (mpg123 / libvorbisfile), so a round-trip is a real
cross-implementation check, not a self-fulfilling one.
"""

from __future__ import annotations

import ctypes

import numpy as np

_lame = None
_vorbis = None  # (ogg, vorbis, vorbisenc) triple


class OggPacket(ctypes.Structure):
    # ogg/ogg.h — layout is part of the public ABI
    _fields_ = [
        ("packet", ctypes.c_void_p),
        ("bytes", ctypes.c_long),
        ("b_o_s", ctypes.c_long),
        ("e_o_s", ctypes.c_long),
        ("granulepos", ctypes.c_int64),
        ("packetno", ctypes.c_int64),
    ]


class OggPage(ctypes.Structure):
    _fields_ = [
        ("header", ctypes.POINTER(ctypes.c_ubyte)),
        ("header_len", ctypes.c_long),
        ("body", ctypes.POINTER(ctypes.c_ubyte)),
        ("body_len", ctypes.c_long),
    ]


def _load_lame():
    global _lame
    if _lame is None:
        lame = ctypes.CDLL("libmp3lame.so.0")
        lame.lame_init.restype = ctypes.c_void_p
        for f in (
            "lame_set_in_samplerate",
            "lame_set_num_channels",
            "lame_set_mode",
            "lame_set_brate",
            "lame_set_quality",
        ):
            getattr(lame, f).restype = ctypes.c_int
            getattr(lame, f).argtypes = [ctypes.c_void_p, ctypes.c_int]
        lame.lame_init_params.restype = ctypes.c_int
        lame.lame_init_params.argtypes = [ctypes.c_void_p]
        lame.lame_encode_buffer_ieee_float.restype = ctypes.c_int
        lame.lame_encode_buffer_ieee_float.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int,
        ]
        lame.lame_encode_flush.restype = ctypes.c_int
        lame.lame_encode_flush.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int,
        ]
        lame.lame_close.restype = ctypes.c_int
        lame.lame_close.argtypes = [ctypes.c_void_p]
        _lame = lame
    return _lame


def write_mp3(path, left, sr, right=None, brate=128):
    """Encode float32 samples (mono, or stereo via ``right``) to MP3."""
    lame = _load_lame()
    left = np.ascontiguousarray(left, np.float32)
    stereo = right is not None
    right = np.ascontiguousarray(right if stereo else left, np.float32)
    g = lame.lame_init()
    lame.lame_set_in_samplerate(g, int(sr))
    lame.lame_set_num_channels(g, 2 if stereo else 1)
    lame.lame_set_mode(g, 0 if stereo else 3)  # 0 STEREO, 3 MONO
    lame.lame_set_brate(g, brate)
    lame.lame_set_quality(g, 2)
    if lame.lame_init_params(g) != 0:
        lame.lame_close(g)
        raise RuntimeError("lame_init_params failed")
    cap = int(1.25 * len(left)) + 7200  # LAME's documented worst case
    out = np.empty(cap, np.uint8)
    n = lame.lame_encode_buffer_ieee_float(
        g, left.ctypes.data, right.ctypes.data, len(left), out.ctypes.data, cap
    )
    if n < 0:
        lame.lame_close(g)
        raise RuntimeError(f"lame_encode_buffer failed ({n})")
    data = out[:n].tobytes()
    n = lame.lame_encode_flush(g, out.ctypes.data, cap)
    data += out[:n].tobytes()
    lame.lame_close(g)
    with open(path, "wb") as f:
        f.write(data)


def _load_vorbis():
    global _vorbis
    if _vorbis is None:
        ogg = ctypes.CDLL("libogg.so.0")
        vbs = ctypes.CDLL("libvorbis.so.0")
        enc = ctypes.CDLL("libvorbisenc.so.2")
        vbs.vorbis_analysis_buffer.restype = ctypes.POINTER(
            ctypes.POINTER(ctypes.c_float)
        )
        enc.vorbis_encode_init_vbr.argtypes = [
            ctypes.c_void_p, ctypes.c_long, ctypes.c_long, ctypes.c_float,
        ]
        _vorbis = (ogg, vbs, enc)
    return _vorbis


def write_ogg(path, left, sr, right=None, quality=0.6, serial=0x6D326474):
    """Encode float32 samples (mono, or stereo via ``right``) to Ogg Vorbis.

    Follows the canonical libvorbis encoder flow (three header packets on
    their own flushed pages, then analysis blocks until EOS). The opaque
    codec structs are caller-allocated per the C API; sizes below
    over-allocate generously and let the libraries own the layout.
    """
    ogg, vbs, enc = _load_vorbis()
    channels = [np.ascontiguousarray(left, np.float32)]
    if right is not None:
        channels.append(np.ascontiguousarray(right, np.float32))
    n_total = len(channels[0])

    vi = ctypes.create_string_buffer(512)
    vc = ctypes.create_string_buffer(512)
    vd = ctypes.create_string_buffer(2048)
    vb = ctypes.create_string_buffer(2048)
    stream = ctypes.create_string_buffer(2048)

    vbs.vorbis_info_init(vi)
    if enc.vorbis_encode_init_vbr(vi, len(channels), int(sr), quality) != 0:
        vbs.vorbis_info_clear(vi)
        raise RuntimeError("vorbis_encode_init_vbr failed")
    vbs.vorbis_comment_init(vc)
    vbs.vorbis_analysis_init(vd, vi)
    vbs.vorbis_block_init(vd, vb)
    ogg.ogg_stream_init(stream, serial)

    out = bytearray()
    og = OggPage()
    h1, h2, h3 = OggPacket(), OggPacket(), OggPacket()
    vbs.vorbis_analysis_headerout(
        vd, vc, ctypes.byref(h1), ctypes.byref(h2), ctypes.byref(h3)
    )
    for h in (h1, h2, h3):
        ogg.ogg_stream_packetin(stream, ctypes.byref(h))
    while ogg.ogg_stream_flush(stream, ctypes.byref(og)):
        out += ctypes.string_at(og.header, og.header_len)
        out += ctypes.string_at(og.body, og.body_len)

    op = OggPacket()
    pos, eos, chunk = 0, False, 1024
    while not eos:
        n = min(chunk, n_total - pos)
        if n <= 0:
            vbs.vorbis_analysis_wrote(vd, 0)
        else:
            buf = vbs.vorbis_analysis_buffer(vd, chunk)
            for c, x in enumerate(channels):
                np.ctypeslib.as_array(buf[c], shape=(n,))[:] = x[pos : pos + n]
            vbs.vorbis_analysis_wrote(vd, n)
            pos += n
        while vbs.vorbis_analysis_blockout(vd, vb) == 1:
            vbs.vorbis_analysis(vb, None)
            vbs.vorbis_bitrate_addblock(vb)
            while vbs.vorbis_bitrate_flushpacket(vd, ctypes.byref(op)):
                ogg.ogg_stream_packetin(stream, ctypes.byref(op))
                while not eos:
                    if ogg.ogg_stream_pageout(stream, ctypes.byref(og)) == 0:
                        break
                    hdr = ctypes.string_at(og.header, og.header_len)
                    out += hdr + ctypes.string_at(og.body, og.body_len)
                    if hdr[5] & 0x04:  # page header EOS flag
                        eos = True
    ogg.ogg_stream_clear(stream)
    vbs.vorbis_block_clear(vb)
    vbs.vorbis_dsp_clear(vd)
    vbs.vorbis_comment_clear(vc)
    vbs.vorbis_info_clear(vi)
    with open(path, "wb") as f:
        f.write(bytes(out))
