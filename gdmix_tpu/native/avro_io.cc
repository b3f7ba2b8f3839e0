// Native Avro OCF decoder for flat primitive records (score files).
//
// The file-mode pipeline reads large score avros (uid / predictionScore /
// label / weight / predictionScorePerCoordinate) between every coordinate;
// this decoder replaces the pure-Python datum reader for that hot path. The
// Python side parses the writer schema and hands down a per-field code string;
// anything fancier (nested records, arrays, maps) falls back to Python.
//
// Field codes: L=long, I=int, F=float, D=double, B=boolean,
//              U=union["null","<primitive>"] (null → present flag 0),
//              S=string/bytes (skipped, not returned).
// Codecs: null and deflate (raw zlib inflate).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 avro_io.cc -o libgdmix_avro.so -lz

#include <zlib.h>

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Reader {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  int64_t zigzag() {
    uint64_t acc = 0;
    int shift = 0;
    while (p < end) {
      uint8_t b = *p++;
      acc |= static_cast<uint64_t>(b & 0x7F) << shift;
      if (!(b & 0x80))
        return static_cast<int64_t>((acc >> 1) ^ (~(acc & 1) + 1));
      shift += 7;
      if (shift > 63) break;
    }
    ok = false;
    return 0;
  }

  void skip_bytes(int64_t n) {
    p += n;
    if (p > end) ok = false;
  }

  float f32() {
    float f = 0;
    if (p + 4 <= end) {
      std::memcpy(&f, p, 4);
      p += 4;
    } else {
      ok = false;
    }
    return f;
  }

  double f64() {
    double d = 0;
    if (p + 8 <= end) {
      std::memcpy(&d, p, 8);
      p += 8;
    } else {
      ok = false;
    }
    return d;
  }
};

struct Handle {
  std::string codes;              // per returned column: L/I/F/D/B/U-subtype
  std::vector<char> union_sub;    // for U columns: the non-null branch code
  std::vector<std::vector<double>> fcols;
  std::vector<std::vector<int64_t>> icols;
  std::vector<std::vector<uint8_t>> present;
  std::vector<int> col_of_field;  // schema field → output column (-1 skipped)
  int64_t num_records = 0;
};

bool decode_block(Reader& r, int64_t count, Handle* h) {
  const std::string& codes = h->codes;
  for (int64_t rec = 0; rec < count; ++rec) {
    for (size_t f = 0; f < codes.size(); ++f) {
      char c = codes[f];
      int col = h->col_of_field[f];
      bool null_val = false;
      if (c == 'U') {
        int64_t branch = r.zigzag();
        if (branch == 0) {
          null_val = true;
          c = h->union_sub[f];  // type it WOULD have been
        } else {
          c = h->union_sub[f];
        }
      }
      double dv = 0;
      int64_t iv = 0;
      if (!null_val) {
        switch (c) {
          case 'L': case 'I': iv = r.zigzag(); dv = static_cast<double>(iv); break;
          case 'F': dv = r.f32(); break;
          case 'D': dv = r.f64(); break;
          case 'B': iv = (r.p < r.end) ? *r.p++ : 0; dv = iv; break;
          case 'S': { int64_t n = r.zigzag(); r.skip_bytes(n); break; }
          default: r.ok = false;
        }
      }
      if (!r.ok) return false;
      if (col >= 0) {
        h->fcols[col].push_back(dv);
        h->icols[col].push_back(iv);
        h->present[col].push_back(null_val ? 0 : 1);
      }
    }
    h->num_records++;
  }
  return r.ok;
}

}  // namespace

extern "C" {

// field_codes: one char per schema field, 'U' fields followed in union_subs by
// their non-null branch code (same length as field_codes; '-' for non-unions).
// skip mask: 'S' fields and any '-' code are parsed but not returned.
void* gdx_avro_parse(const uint8_t* data, int64_t len, const char* field_codes,
                     const char* union_subs) {
  auto* h = new Handle();
  h->codes = field_codes;
  h->union_sub.assign(union_subs, union_subs + std::strlen(union_subs));
  int col = 0;
  for (char c : h->codes) {
    if (c == 'S' || c == '-') {
      h->col_of_field.push_back(-1);
    } else {
      h->col_of_field.push_back(col++);
    }
  }
  h->fcols.resize(col);
  h->icols.resize(col);
  h->present.resize(col);

  Reader r{data, data + len};
  // header: magic
  if (len < 4 || std::memcmp(data, "Obj\x01", 4) != 0) { delete h; return nullptr; }
  r.p += 4;
  // metadata map
  std::string codec = "null";
  while (r.ok) {
    int64_t n = r.zigzag();
    if (n == 0) break;
    if (n < 0) { n = -n; r.zigzag(); }
    for (int64_t i = 0; i < n && r.ok; ++i) {
      int64_t klen = r.zigzag();
      std::string key(reinterpret_cast<const char*>(r.p), klen);
      r.skip_bytes(klen);
      int64_t vlen = r.zigzag();
      if (key == "avro.codec")
        codec.assign(reinterpret_cast<const char*>(r.p), vlen);
      r.skip_bytes(vlen);
    }
  }
  if (!r.ok) { delete h; return nullptr; }
  const uint8_t* sync = r.p;
  r.skip_bytes(16);

  std::vector<uint8_t> scratch;
  while (r.ok && r.p < r.end) {
    int64_t count = r.zigzag();
    int64_t size = r.zigzag();
    if (!r.ok || r.p + size + 16 > r.end) { delete h; return nullptr; }
    const uint8_t* payload = r.p;
    int64_t payload_len = size;
    if (codec == "deflate") {
      scratch.clear();
      scratch.resize(std::max<int64_t>(size * 8, 1 << 16));
      z_stream zs{};
      inflateInit2(&zs, -15);
      zs.next_in = const_cast<uint8_t*>(payload);
      zs.avail_in = static_cast<uInt>(size);
      size_t out_len = 0;
      int ret = Z_OK;
      while (ret != Z_STREAM_END) {
        if (out_len == scratch.size()) scratch.resize(scratch.size() * 2);
        zs.next_out = scratch.data() + out_len;
        zs.avail_out = static_cast<uInt>(scratch.size() - out_len);
        ret = inflate(&zs, Z_NO_FLUSH);
        out_len = scratch.size() - zs.avail_out;
        if (ret != Z_OK && ret != Z_STREAM_END) break;
      }
      inflateEnd(&zs);
      if (ret != Z_STREAM_END) { delete h; return nullptr; }
      payload = scratch.data();
      payload_len = static_cast<int64_t>(out_len);
    } else if (codec != "null") {
      delete h;
      return nullptr;  // snappy etc. → python fallback
    }
    Reader br{payload, payload + payload_len};
    if (!decode_block(br, count, h)) { delete h; return nullptr; }
    r.skip_bytes(size);
    if (std::memcmp(r.p, sync, 16) != 0) { delete h; return nullptr; }
    r.skip_bytes(16);
  }
  if (!r.ok) { delete h; return nullptr; }
  return h;
}

int64_t gdx_avro_num_records(void* handle) {
  return static_cast<Handle*>(handle)->num_records;
}

void gdx_avro_fill_f64(void* handle, int32_t col, double* out, uint8_t* present) {
  auto* h = static_cast<Handle*>(handle);
  std::memcpy(out, h->fcols[col].data(), h->fcols[col].size() * sizeof(double));
  std::memcpy(present, h->present[col].data(), h->present[col].size());
}

void gdx_avro_fill_i64(void* handle, int32_t col, int64_t* out, uint8_t* present) {
  auto* h = static_cast<Handle*>(handle);
  std::memcpy(out, h->icols[col].data(), h->icols[col].size() * sizeof(int64_t));
  std::memcpy(present, h->present[col].data(), h->present[col].size());
}

void gdx_avro_free(void* handle) { delete static_cast<Handle*>(handle); }

// ---------------------------------------------------------------------------
// Columnar encoder: rows [start, start+count) of parallel column arrays →
// concatenated Avro record datums (one block payload). The Python side owns
// the OCF container framing (header/codec/sync); this is only the per-record
// encoding loop that dominates score writing (io_utils.py:299-334 in the
// reference writes these files via fastavro's per-record datum writer).
//
// codes[i]: 'L'/'I' (int64 col, varint zigzag), 'D' (double), 'F' (double col
//           cast to float32), 'B' (int64 col, 1 byte).
// nullable[i]: field is union ["null", <prim>] → a branch index is written;
//              present[i] (uint8 per row, may be NULL = all present) picks it.
// Returns bytes written, or -1 if `cap` is too small (caller sizes cap from
// the per-type maxima, so this only fires on a caller bug).
int64_t gdx_avro_encode(const char* codes, const uint8_t* nullable,
                        int32_t ncols, const int64_t** icols,
                        const double** dcols, const uint8_t** present,
                        int64_t start, int64_t count, uint8_t* out,
                        int64_t cap) {
  uint8_t* p = out;
  uint8_t* end = out + cap;
  for (int64_t row = start; row < start + count; ++row) {
    if (end - p < 16 * ncols) return -1;  // 16 ≥ max field footprint
    for (int32_t f = 0; f < ncols; ++f) {
      bool is_present = !present[f] || present[f][row];
      if (nullable[f]) {
        *p++ = is_present ? 0x02 : 0x00;  // zigzag(1)=2 / zigzag(0)=0
        if (!is_present) continue;
      }
      switch (codes[f]) {
        case 'L':
        case 'I': {
          uint64_t z = static_cast<uint64_t>(icols[f][row]);
          z = (z << 1) ^ static_cast<uint64_t>(icols[f][row] >> 63);
          while (z >= 0x80) {
            *p++ = static_cast<uint8_t>(z) | 0x80;
            z >>= 7;
          }
          *p++ = static_cast<uint8_t>(z);
          break;
        }
        case 'D': {
          std::memcpy(p, &dcols[f][row], 8);
          p += 8;
          break;
        }
        case 'F': {
          float v = static_cast<float>(dcols[f][row]);
          std::memcpy(p, &v, 4);
          p += 4;
          break;
        }
        case 'B': {
          *p++ = icols[f][row] ? 1 : 0;
          break;
        }
        default:
          return -1;
      }
    }
  }
  return p - out;
}

}  // extern "C"
