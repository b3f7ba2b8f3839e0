// Native TFRecord + tf.train.Example batch decoder.
//
// The reference relies on TensorFlow's C++ tf.data kernels for record decode
// (SURVEY.md §2 native-surface list); this is the equivalent native component
// for the TPU build's host-side input path: one pass over a TFRecord buffer,
// protobuf wire-format Example parsing (the narrow schema the framework uses:
// scalar int64/float dense columns + one sparse indices/values feature bag),
// filled straight into caller-provided numpy buffers via a ctypes C API.
//
// Wire format notes (mirrors gdmix_tpu/io/proto.py, verified against
// tf.train.Example in tests):
//   Example        = { 1: Features }
//   Features       = { 1: repeated MapEntry { 1: key, 2: Feature } }
//   Feature        = { 1: BytesList, 2: FloatList, 3: Int64List }
//   FloatList      = { 1: packed/unpacked float }
//   Int64List      = { 1: packed/unpacked varint }
// TFRecord framing = u64 len | u32 crc(len) | payload | u32 crc(payload).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 tfrecord_io.cc -o libgdmix_io.so

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Slice {
  const uint8_t* p;
  const uint8_t* end;
  bool ok = true;

  bool empty() const { return p >= end; }

  uint64_t varint() {
    uint64_t acc = 0;
    int shift = 0;
    while (p < end) {
      uint8_t b = *p++;
      acc |= static_cast<uint64_t>(b & 0x7F) << shift;
      if (!(b & 0x80)) return acc;
      shift += 7;
      if (shift > 63) break;
    }
    ok = false;
    return 0;
  }

  Slice sub(uint64_t n) {
    if (p + n > end) {
      ok = false;
      return {end, end};
    }
    Slice s{p, p + n};
    p += n;
    return s;
  }

  void skip(uint32_t wire) {
    switch (wire) {
      case 0: varint(); break;
      case 1: p += 8; break;
      case 2: { uint64_t n = varint(); p += n; break; }
      case 5: p += 4; break;
      default: ok = false;
    }
    if (p > end) ok = false;
  }
};

// One record's decoded feature values (only what the schema asks for).
struct Parsed {
  // dense scalar columns: first value of each requested feature. Int64 values
  // keep exact 64-bit fidelity in dense_i (doubles only carry 53 bits).
  std::vector<double> dense;     // [num_dense]
  std::vector<int64_t> dense_i;  // [num_dense]
  std::vector<uint8_t> present;  // [num_dense]
  std::vector<int64_t> bag_idx;
  std::vector<double> bag_val;
};

struct Handle {
  std::vector<std::string> dense_names;
  std::string idx_name, val_name;
  std::vector<Parsed> records;
  int32_t max_nnz = 0;
  std::string error;
};

// Parse a Feature message, appending numeric values to out (and exact int64
// copies to iout when the wire type was Int64List).
void parse_feature_values(Slice s, std::vector<double>* out,
                          std::vector<int64_t>* iout = nullptr) {
  while (!s.empty() && s.ok) {
    uint64_t tag = s.varint();
    uint32_t field = tag >> 3, wire = tag & 7;
    if (wire != 2) { s.skip(wire); continue; }
    Slice inner = s.sub(s.varint());
    if (field == 2) {  // FloatList
      while (!inner.empty() && inner.ok) {
        uint64_t t2 = inner.varint();
        if ((t2 >> 3) == 1 && (t2 & 7) == 2) {  // packed
          Slice packed = inner.sub(inner.varint());
          while (packed.p + 4 <= packed.end) {
            float f;
            std::memcpy(&f, packed.p, 4);
            packed.p += 4;
            out->push_back(static_cast<double>(f));
          }
        } else if ((t2 >> 3) == 1 && (t2 & 7) == 5) {
          float f;
          if (inner.p + 4 <= inner.end) {
            std::memcpy(&f, inner.p, 4);
            inner.p += 4;
            out->push_back(static_cast<double>(f));
          } else {
            inner.ok = false;
          }
        } else {
          inner.skip(t2 & 7);
        }
      }
    } else if (field == 3) {  // Int64List
      while (!inner.empty() && inner.ok) {
        uint64_t t2 = inner.varint();
        if ((t2 >> 3) == 1 && (t2 & 7) == 2) {  // packed
          Slice packed = inner.sub(inner.varint());
          while (!packed.empty() && packed.ok) {
            int64_t v = static_cast<int64_t>(packed.varint());
            out->push_back(static_cast<double>(v));
            if (iout) iout->push_back(v);
          }
        } else if ((t2 >> 3) == 1 && (t2 & 7) == 0) {
          int64_t v = static_cast<int64_t>(inner.varint());
          out->push_back(static_cast<double>(v));
          if (iout) iout->push_back(v);
        } else {
          inner.skip(t2 & 7);
        }
      }
    }
    // BytesList (field 1) ignored: string columns use the python path.
  }
}

void parse_example(Slice payload, Handle* h, Parsed* rec) {
  const size_t nd = h->dense_names.size();
  rec->dense.assign(nd, 0.0);
  rec->dense_i.assign(nd, 0);
  rec->present.assign(nd, 0);
  while (!payload.empty() && payload.ok) {
    uint64_t tag = payload.varint();
    if (tag != ((1 << 3) | 2)) { payload.skip(tag & 7); continue; }
    Slice features = payload.sub(payload.varint());
    while (!features.empty() && features.ok) {
      uint64_t ftag = features.varint();
      if (ftag != ((1 << 3) | 2)) { features.skip(ftag & 7); continue; }
      Slice entry = features.sub(features.varint());
      std::string key;
      Slice feature{nullptr, nullptr};
      while (!entry.empty() && entry.ok) {
        uint64_t etag = entry.varint();
        uint32_t fieldno = etag >> 3, wire = etag & 7;
        if (wire != 2) { entry.skip(wire); continue; }
        Slice v = entry.sub(entry.varint());
        if (fieldno == 1) {
          key.assign(reinterpret_cast<const char*>(v.p), v.end - v.p);
        } else if (fieldno == 2) {
          feature = v;
        }
      }
      if (feature.p == nullptr) continue;
      if (key == h->idx_name) {
        std::vector<double> vals;
        parse_feature_values(feature, &vals);
        rec->bag_idx.reserve(vals.size());
        for (double d : vals) rec->bag_idx.push_back(static_cast<int64_t>(d));
      } else if (key == h->val_name) {
        parse_feature_values(feature, &rec->bag_val);
      } else {
        for (size_t i = 0; i < nd; ++i) {
          if (key == h->dense_names[i]) {
            std::vector<double> vals;
            std::vector<int64_t> ivals;
            parse_feature_values(feature, &vals, &ivals);
            if (!vals.empty()) {
              rec->dense[i] = vals[0];
              rec->dense_i[i] = ivals.empty()
                  ? static_cast<int64_t>(vals[0]) : ivals[0];
              rec->present[i] = 1;
            }
            break;
          }
        }
      }
    }
  }
}

}  // namespace

extern "C" {

// Parse an in-memory TFRecord buffer. Returns a handle (or nullptr on error).
void* gdx_parse(const uint8_t* data, int64_t len, const char** dense_names,
                int32_t num_dense, const char* idx_name, const char* val_name) {
  auto* h = new Handle();
  for (int32_t i = 0; i < num_dense; ++i) h->dense_names.emplace_back(dense_names[i]);
  h->idx_name = idx_name ? idx_name : "";
  h->val_name = val_name ? val_name : "";

  const uint8_t* p = data;
  const uint8_t* end = data + len;
  while (p < end) {
    if (p + 12 > end) { delete h; return nullptr; }
    uint64_t rec_len;
    std::memcpy(&rec_len, p, 8);
    p += 12;  // len + len-crc
    if (p + rec_len + 4 > end) { delete h; return nullptr; }
    Slice payload{p, p + rec_len};
    p += rec_len + 4;  // payload + payload-crc
    h->records.emplace_back();
    parse_example(payload, h, &h->records.back());
    if (!payload.ok) { delete h; return nullptr; }
    int32_t nnz = static_cast<int32_t>(h->records.back().bag_idx.size());
    if (nnz > h->max_nnz) h->max_nnz = nnz;
  }
  return h;
}

int64_t gdx_num_records(void* handle) {
  return static_cast<Handle*>(handle)->records.size();
}

int32_t gdx_max_nnz(void* handle) {
  return static_cast<Handle*>(handle)->max_nnz;
}

// Fill a dense column: out[N] doubles, present[N] flags (0 → absent).
void gdx_fill_dense(void* handle, int32_t col, double* out, uint8_t* present) {
  auto* h = static_cast<Handle*>(handle);
  for (size_t i = 0; i < h->records.size(); ++i) {
    out[i] = h->records[i].dense[col];
    present[i] = h->records[i].present[col];
  }
}

// Fill a dense column with exact int64 values.
void gdx_fill_dense_i64(void* handle, int32_t col, int64_t* out,
                        uint8_t* present) {
  auto* h = static_cast<Handle*>(handle);
  for (size_t i = 0; i < h->records.size(); ++i) {
    out[i] = h->records[i].dense_i[col];
    present[i] = h->records[i].present[col];
  }
}

// Fill the sparse bag: idx_out/val_out are [N, K] row-major (zero-prefilled by
// the caller), nnz_out is [N].
void gdx_fill_sparse(void* handle, int32_t K, int64_t* idx_out, double* val_out,
                     int32_t* nnz_out) {
  auto* h = static_cast<Handle*>(handle);
  for (size_t i = 0; i < h->records.size(); ++i) {
    const Parsed& r = h->records[i];
    int32_t n = static_cast<int32_t>(r.bag_idx.size());
    if (n > K) n = K;
    nnz_out[i] = n;
    for (int32_t j = 0; j < n; ++j) {
      idx_out[i * K + j] = r.bag_idx[j];
      val_out[i * K + j] = j < static_cast<int32_t>(r.bag_val.size())
                               ? r.bag_val[j] : 0.0;
    }
  }
}

void gdx_free(void* handle) { delete static_cast<Handle*>(handle); }

}  // extern "C"
