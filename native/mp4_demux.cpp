// Minimal ISO-BMFF (MP4/MOV) demuxer — the ffmpeg-free host decode stage.
//
// The reference shells out to ffmpeg for its video preprocessing
// (cremad/video_preprocessing.py:36-76 frame extraction,
// vggsound/mp4_to_wav.py:26-44 audio extraction).  This image has no
// ffmpeg, so the TPU rebuild demuxes the container natively: parse
// moov/trak/stbl, precompute per-sample (offset, size, time), and serve
// samples by index.  MJPEG video samples are complete JPEG images (decoded
// by the native libjpeg path in jpeg_decode.cpp); PCM audio samples are
// raw frames (converted to wav host-side).  Compressed codecs (H.264/AAC)
// still require ffmpeg — tools/preprocess.py reports that explicitly.
//
// Exposed through ctypes (utils/native.py).  Build: make -C native.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct SampleIndex {
  std::vector<uint64_t> offset;  // absolute file offset per sample
  std::vector<uint32_t> size;    // bytes per sample
  std::vector<uint64_t> time;    // decode time in media timescale units
};

struct Track {
  uint32_t handler = 0;    // 'vide' / 'soun'
  uint32_t codec = 0;      // stsd entry fourcc ('jpeg', 'sowt', 'avc1', ...)
  uint32_t timescale = 0;  // mdhd media timescale
  uint64_t duration = 0;   // mdhd media duration
  uint32_t width = 0, height = 0;        // video
  uint32_t channels = 0, bits = 0;       // audio
  uint32_t sample_rate = 0;              // audio (integer part of 16.16)
  SampleIndex samples;
};

struct Mp4 {
  FILE* f = nullptr;
  std::vector<Track> tracks;
};

// ----- big-endian readers over an in-memory box buffer --------------------
struct Cursor {
  const uint8_t* p;
  size_t n;
  bool ok(size_t off, size_t len) const { return off + len <= n; }
};

static uint16_t be16(const uint8_t* p) { return (uint16_t)((p[0] << 8) | p[1]); }
static uint32_t be32(const uint8_t* p) {
  return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) |
         ((uint32_t)p[2] << 8) | p[3];
}
static uint64_t be64(const uint8_t* p) {
  return ((uint64_t)be32(p) << 32) | be32(p + 4);
}

// Iterate child boxes of buf[0..n): calls visit(type, body, body_len).
template <typename F>
static void for_each_box(const uint8_t* buf, size_t n, F visit) {
  size_t off = 0;
  while (off + 8 <= n) {
    uint64_t size = be32(buf + off);
    uint32_t type = be32(buf + off + 4);
    size_t header = 8;
    if (size == 1) {
      if (off + 16 > n) return;
      size = be64(buf + off + 8);
      header = 16;
    } else if (size == 0) {
      size = n - off;  // box extends to end
    }
    // overflow-safe bounds check (a corrupt 64-bit largesize must not
    // wrap off + size): off <= n holds by loop invariant
    if (size < header || size > n - off) return;  // malformed: stop
    visit(type, buf + off + header, (size_t)(size - header));
    off += (size_t)size;
  }
}

static uint32_t fourcc(const char* s) {
  return ((uint32_t)(uint8_t)s[0] << 24) | ((uint32_t)(uint8_t)s[1] << 16) |
         ((uint32_t)(uint8_t)s[2] << 8) | (uint8_t)s[3];
}

// ----- stbl parsing --------------------------------------------------------
struct Stbl {
  // stsd first-entry info
  uint32_t codec = 0;
  uint32_t width = 0, height = 0, channels = 0, bits = 0, sample_rate = 0;
  // raw tables
  uint32_t stsz_uniform = 0;
  std::vector<uint32_t> stsz;                 // per-sample sizes (if not uniform)
  uint64_t stsz_count = 0;
  std::vector<std::pair<uint32_t, uint32_t>> stts;   // (count, delta)
  struct StscEntry { uint32_t first_chunk, per_chunk; };
  std::vector<StscEntry> stsc;
  std::vector<uint64_t> chunk_offsets;        // stco / co64
};

static void parse_stsd(const uint8_t* b, size_t n, uint32_t handler, Stbl* out) {
  if (n < 8) return;
  // version/flags (4) + entry_count (4), then first sample entry
  const uint8_t* e = b + 8;
  size_t en = n - 8;
  if (en < 16) return;
  uint32_t esize = be32(e);
  out->codec = be32(e + 4);
  if (esize > en) esize = (uint32_t)en;
  if (handler == fourcc("vide") && esize >= 36) {
    out->width = be16(e + 32);
    out->height = be16(e + 34);
  } else if (handler == fourcc("soun") && esize >= 36) {
    out->channels = be16(e + 24);
    out->bits = be16(e + 26);
    out->sample_rate = be16(e + 32);  // integer part of 16.16
  }
}

static void parse_stbl(const uint8_t* b, size_t n, uint32_t handler, Stbl* out) {
  for_each_box(b, n, [&](uint32_t type, const uint8_t* c, size_t cn) {
    if (type == fourcc("stsd")) {
      parse_stsd(c, cn, handler, out);
    } else if (type == fourcc("stsz") && cn >= 12) {
      out->stsz_uniform = be32(c + 4);
      out->stsz_count = be32(c + 8);
      if (out->stsz_uniform == 0) {
        uint64_t cnt = out->stsz_count;
        if (12 + cnt * 4 <= cn) {
          out->stsz.resize(cnt);
          for (uint64_t i = 0; i < cnt; ++i)
            out->stsz[i] = be32(c + 12 + i * 4);
        }
      }
    } else if (type == fourcc("stts") && cn >= 8) {
      uint32_t cnt = be32(c + 4);
      if (8 + (uint64_t)cnt * 8 <= cn)
        for (uint32_t i = 0; i < cnt; ++i)
          out->stts.emplace_back(be32(c + 8 + i * 8), be32(c + 12 + i * 8));
    } else if (type == fourcc("stsc") && cn >= 8) {
      uint32_t cnt = be32(c + 4);
      if (8 + (uint64_t)cnt * 12 <= cn)
        for (uint32_t i = 0; i < cnt; ++i)
          out->stsc.push_back({be32(c + 8 + i * 12), be32(c + 12 + i * 12)});
    } else if (type == fourcc("stco") && cn >= 8) {
      uint32_t cnt = be32(c + 4);
      if (8 + (uint64_t)cnt * 4 <= cn)
        for (uint32_t i = 0; i < cnt; ++i)
          out->chunk_offsets.push_back(be32(c + 8 + i * 4));
    } else if (type == fourcc("co64") && cn >= 8) {
      uint32_t cnt = be32(c + 4);
      if (8 + (uint64_t)cnt * 8 <= cn)
        for (uint32_t i = 0; i < cnt; ++i)
          out->chunk_offsets.push_back(be64(c + 8 + i * 8));
    }
  });
}

// Expand the chunk/size/time tables into flat per-sample arrays.
static bool build_index(const Stbl& s, Track* t) {
  uint64_t n = s.stsz_count;
  if (n == 0 || s.chunk_offsets.empty() || s.stsc.empty()) return false;
  t->samples.offset.reserve(n);
  t->samples.size.reserve(n);

  uint64_t sample = 0;
  size_t n_chunks = s.chunk_offsets.size();
  for (size_t ci = 0; ci < n_chunks && sample < n; ++ci) {
    // samples-per-chunk for chunk ci+1 (1-based) from the stsc run map
    uint32_t per = s.stsc[0].per_chunk;
    for (const auto& e : s.stsc) {
      if (e.first_chunk <= ci + 1) per = e.per_chunk;
      else break;
    }
    uint64_t off = s.chunk_offsets[ci];
    for (uint32_t k = 0; k < per && sample < n; ++k, ++sample) {
      uint32_t sz = s.stsz_uniform ? s.stsz_uniform
                    : (sample < s.stsz.size() ? s.stsz[sample] : 0);
      t->samples.offset.push_back(off);
      t->samples.size.push_back(sz);
      off += sz;
    }
  }
  // decode timestamps from stts runs
  t->samples.time.reserve(t->samples.offset.size());
  uint64_t tm = 0;
  for (const auto& run : s.stts) {
    for (uint32_t i = 0; i < run.first && t->samples.time.size() < n; ++i) {
      t->samples.time.push_back(tm);
      tm += run.second;
    }
  }
  while (t->samples.time.size() < t->samples.offset.size())
    t->samples.time.push_back(tm);
  return !t->samples.offset.empty();
}

static void parse_trak(const uint8_t* b, size_t n, Mp4* mp4) {
  Track t;
  Stbl stbl;
  const uint8_t *mdia = nullptr, *minf = nullptr, *stbl_b = nullptr;
  size_t mdia_n = 0, minf_n = 0, stbl_n = 0;
  for_each_box(b, n, [&](uint32_t type, const uint8_t* c, size_t cn) {
    if (type == fourcc("mdia")) { mdia = c; mdia_n = cn; }
  });
  if (!mdia) return;
  for_each_box(mdia, mdia_n, [&](uint32_t type, const uint8_t* c, size_t cn) {
    if (type == fourcc("mdhd") && cn >= 4) {
      uint8_t version = c[0];
      if (version == 1 && cn >= 28) {
        t.timescale = be32(c + 20);
        t.duration = be64(c + 24);
      } else if (cn >= 20) {
        t.timescale = be32(c + 12);
        t.duration = be32(c + 16);
      }
    } else if (type == fourcc("hdlr") && cn >= 12) {
      t.handler = be32(c + 8);
    } else if (type == fourcc("minf")) { minf = c; minf_n = cn; }
  });
  if (!minf) return;
  for_each_box(minf, minf_n, [&](uint32_t type, const uint8_t* c, size_t cn) {
    if (type == fourcc("stbl")) { stbl_b = c; stbl_n = cn; }
  });
  if (!stbl_b) return;
  parse_stbl(stbl_b, stbl_n, t.handler, &stbl);
  t.codec = stbl.codec;
  t.width = stbl.width;
  t.height = stbl.height;
  t.channels = stbl.channels;
  t.bits = stbl.bits;
  t.sample_rate = stbl.sample_rate;
  if (build_index(stbl, &t)) mp4->tracks.push_back(std::move(t));
}

}  // namespace

extern "C" {

void* mp4_open(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;
  Mp4* mp4 = new Mp4;
  mp4->f = f;

  // top-level scan for the moov box (load it fully; it is metadata-sized)
  uint8_t hdr[16];
  uint64_t off = 0;
  std::vector<uint8_t> moov;
  for (;;) {
    if (fseek(f, (long)off, SEEK_SET) != 0) break;
    if (fread(hdr, 1, 8, f) != 8) break;
    uint64_t size = be32(hdr);
    uint32_t type = be32(hdr + 4);
    size_t header = 8;
    if (size == 1) {
      if (fread(hdr + 8, 1, 8, f) != 8) break;
      size = be64(hdr + 8);
      header = 16;
    } else if (size == 0) {
      if (fseek(f, 0, SEEK_END) != 0) break;
      size = (uint64_t)ftell(f) - off;
      fseek(f, (long)(off + header), SEEK_SET);
    }
    if (size < header) break;
    if (type == fourcc("moov")) {
      size_t body = (size_t)(size - header);
      if (body > (size_t)1 << 30) break;  // sanity: moov > 1 GiB is bogus
      moov.resize(body);
      if (fread(moov.data(), 1, body, f) != body) break;
      for_each_box(moov.data(), moov.size(),
                   [&](uint32_t t2, const uint8_t* c, size_t cn) {
                     if (t2 == fourcc("trak")) parse_trak(c, cn, mp4);
                   });
      break;
    }
    off += size;
  }
  if (mp4->tracks.empty()) {
    fclose(f);
    delete mp4;
    return nullptr;
  }
  return mp4;
}

void mp4_close(void* h) {
  Mp4* mp4 = (Mp4*)h;
  if (!mp4) return;
  if (mp4->f) fclose(mp4->f);
  delete mp4;
}

int mp4_track_count(void* h) { return (int)((Mp4*)h)->tracks.size(); }

// out[10]: handler, codec, timescale, n_samples, width, height, channels,
//          sample_rate, bits, duration
int mp4_track_info(void* h, int t, int64_t* out) {
  Mp4* mp4 = (Mp4*)h;
  if (t < 0 || t >= (int)mp4->tracks.size()) return -1;
  const Track& tr = mp4->tracks[t];
  out[0] = tr.handler;
  out[1] = tr.codec;
  out[2] = tr.timescale;
  out[3] = (int64_t)tr.samples.size.size();
  out[4] = tr.width;
  out[5] = tr.height;
  out[6] = tr.channels;
  out[7] = tr.sample_rate;
  out[8] = tr.bits;
  out[9] = (int64_t)tr.duration;
  return 0;
}

int64_t mp4_sample_size(void* h, int t, int64_t i) {
  Mp4* mp4 = (Mp4*)h;
  if (t < 0 || t >= (int)mp4->tracks.size()) return -1;
  const SampleIndex& s = mp4->tracks[t].samples;
  if (i < 0 || i >= (int64_t)s.size.size()) return -1;
  return s.size[i];
}

int64_t mp4_sample_time(void* h, int t, int64_t i) {
  Mp4* mp4 = (Mp4*)h;
  if (t < 0 || t >= (int)mp4->tracks.size()) return -1;
  const SampleIndex& s = mp4->tracks[t].samples;
  if (i < 0 || i >= (int64_t)s.time.size()) return -1;
  return (int64_t)s.time[i];
}

int64_t mp4_read_sample(void* h, int t, int64_t i, uint8_t* buf, int64_t cap) {
  Mp4* mp4 = (Mp4*)h;
  if (t < 0 || t >= (int)mp4->tracks.size()) return -1;
  const SampleIndex& s = mp4->tracks[t].samples;
  if (i < 0 || i >= (int64_t)s.size.size()) return -1;
  int64_t sz = s.size[i];
  if (sz > cap) return -2;
  if (fseek(mp4->f, (long)s.offset[i], SEEK_SET) != 0) return -3;
  if ((int64_t)fread(buf, 1, (size_t)sz, mp4->f) != sz) return -3;
  return sz;
}

// Total bytes of samples [i0, i1) — sized buffer allocation without a
// per-sample FFI round trip (PCM tracks have one sample per frame).
int64_t mp4_range_bytes(void* h, int t, int64_t i0, int64_t i1) {
  Mp4* mp4 = (Mp4*)h;
  if (t < 0 || t >= (int)mp4->tracks.size()) return -1;
  const SampleIndex& s = mp4->tracks[t].samples;
  if (i0 < 0 || i1 > (int64_t)s.size.size() || i0 > i1) return -1;
  int64_t total = 0;
  for (int64_t i = i0; i < i1; ++i) total += s.size[i];
  return total;
}

// Concatenated samples [i0, i1) — the bulk path for PCM audio tracks.
int64_t mp4_read_range(void* h, int t, int64_t i0, int64_t i1, uint8_t* buf,
                       int64_t cap) {
  Mp4* mp4 = (Mp4*)h;
  if (t < 0 || t >= (int)mp4->tracks.size()) return -1;
  const SampleIndex& s = mp4->tracks[t].samples;
  int64_t n = (int64_t)s.size.size();
  if (i0 < 0 || i1 > n || i0 > i1) return -1;
  int64_t written = 0;
  int64_t run_start = i0;
  while (run_start < i1) {
    // coalesce contiguous-in-file runs into single reads
    int64_t run_end = run_start + 1;
    uint64_t off = s.offset[run_start];
    uint64_t end = off + s.size[run_start];
    while (run_end < i1 && s.offset[run_end] == end) {
      end += s.size[run_end];
      ++run_end;
    }
    int64_t bytes = (int64_t)(end - off);
    if (written + bytes > cap) return -2;
    if (fseek(mp4->f, (long)off, SEEK_SET) != 0) return -3;
    if ((int64_t)fread(buf + written, 1, (size_t)bytes, mp4->f) != bytes)
      return -3;
    written += bytes;
    run_start = run_end;
  }
  return written;
}

}  // extern "C"
