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

// ---------------------------------------------------------------------------
// SequenceExample (grouped per-entity) decoder.
//
// The reference decodes grouped datasets with TF's C++ parse_sequence_example
// kernel (input_data_pipeline.py:223-332); this is the TPU build's native
// equivalent for the random-effect input path. One record = one entity:
//   SequenceExample = { 1: context (Features), 2: feature_lists }
//   FeatureLists    = { 1: repeated MapEntry { 1: key, 2: FeatureList } }
//   FeatureList     = { 1: repeated Feature }
// Context carries the scalar entity id + VarLen per-record columns; the
// sequence carries the ragged sparse feature bag. Output is COLUMNAR: flat
// per-record arrays for the whole buffer plus per-entity record counts, so
// Python builds entity views with zero per-record work.
// ---------------------------------------------------------------------------

namespace {

struct SeqParsed {
  std::string entity;
  std::vector<std::vector<double>> ctx;     // [num_ctx][n_records]
  std::vector<std::vector<int64_t>> ctx_i;  // exact int64 copies
  std::vector<uint8_t> ctx_present;         // [num_ctx]
  std::vector<std::vector<int64_t>> step_idx;  // [n_records][nnz]
  std::vector<std::vector<double>> step_val;
  int32_t n_records = 0;
};

struct SeqHandle {
  std::vector<std::string> ctx_names;
  std::string entity_name, idx_name, val_name;
  std::vector<SeqParsed> entities;
  int64_t total_records = 0;
  int64_t total_id_bytes = 0;
  int32_t max_nnz = 0;
  bool unknown_context = false;  // context key outside the requested schema
};

// First bytes value of a Feature's BytesList (entity ids); empty if none.
std::string parse_feature_first_bytes(Slice s, bool* found) {
  *found = false;
  while (!s.empty() && s.ok) {
    uint64_t tag = s.varint();
    if ((tag >> 3) == 1 && (tag & 7) == 2) {  // BytesList
      Slice inner = s.sub(s.varint());
      while (!inner.empty() && inner.ok) {
        uint64_t t2 = inner.varint();
        if ((t2 >> 3) == 1 && (t2 & 7) == 2) {
          Slice v = inner.sub(inner.varint());
          *found = true;
          return std::string(reinterpret_cast<const char*>(v.p), v.end - v.p);
        }
        inner.skip(t2 & 7);
      }
    } else {
      s.skip(tag & 7);
    }
  }
  return "";
}

// Parse the Features message of a context block into rec.
void parse_seq_context(Slice features, SeqHandle* h, SeqParsed* rec) {
  const size_t nc = h->ctx_names.size();
  rec->ctx.assign(nc, {});
  rec->ctx_i.assign(nc, {});
  rec->ctx_present.assign(nc, 0);
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
    if (key == h->entity_name) {
      bool found = false;
      std::string id = parse_feature_first_bytes(feature, &found);
      if (found) {
        rec->entity = std::move(id);
      } else {  // Int64List entity id → decimal string (≡ python str())
        std::vector<double> vals;
        std::vector<int64_t> ivals;
        parse_feature_values(feature, &vals, &ivals);
        if (!ivals.empty()) rec->entity = std::to_string(ivals[0]);
        else if (!vals.empty())
          rec->entity = std::to_string(static_cast<int64_t>(vals[0]));
      }
      continue;
    }
    bool known = false;
    for (size_t i = 0; i < nc; ++i) {
      if (key == h->ctx_names[i]) {
        parse_feature_values(feature, &rec->ctx[i], &rec->ctx_i[i]);
        if (rec->ctx_i[i].empty())
          rec->ctx_i[i].assign(rec->ctx[i].size(), 0);
        rec->ctx_present[i] = 1;
        known = true;
        break;
      }
    }
    if (!known) h->unknown_context = true;
  }
}

// Parse the FeatureLists message, keeping only the idx/val lists.
void parse_seq_lists(Slice lists, SeqHandle* h, SeqParsed* rec) {
  while (!lists.empty() && lists.ok) {
    uint64_t tag = lists.varint();
    if (tag != ((1 << 3) | 2)) { lists.skip(tag & 7); continue; }
    Slice entry = lists.sub(lists.varint());
    std::string key;
    Slice flist{nullptr, nullptr};
    while (!entry.empty() && entry.ok) {
      uint64_t etag = entry.varint();
      uint32_t fieldno = etag >> 3, wire = etag & 7;
      if (wire != 2) { entry.skip(wire); continue; }
      Slice v = entry.sub(entry.varint());
      if (fieldno == 1) {
        key.assign(reinterpret_cast<const char*>(v.p), v.end - v.p);
      } else if (fieldno == 2) {
        flist = v;  // whole FeatureList slice (repeated field 1 = Feature)
      }
    }
    bool want_idx = (key == h->idx_name), want_val = (key == h->val_name);
    if (flist.p == nullptr || (!want_idx && !want_val)) continue;
    while (!flist.empty() && flist.ok) {
      uint64_t t = flist.varint();
      if (t != ((1 << 3) | 2)) { flist.skip(t & 7); continue; }
      Slice feature = flist.sub(flist.varint());
      std::vector<double> vals;
      std::vector<int64_t> ivals;
      parse_feature_values(feature, &vals, &ivals);
      if (want_idx) {
        if (!ivals.empty() || vals.empty()) {
          h->max_nnz = std::max<int32_t>(h->max_nnz, ivals.size());
          rec->step_idx.push_back(std::move(ivals));
        } else {
          std::vector<int64_t> conv(vals.size());
          for (size_t i = 0; i < vals.size(); ++i)
            conv[i] = static_cast<int64_t>(vals[i]);
          h->max_nnz = std::max<int32_t>(h->max_nnz, conv.size());
          rec->step_idx.push_back(std::move(conv));
        }
      } else {
        h->max_nnz = std::max<int32_t>(h->max_nnz, vals.size());
        rec->step_val.push_back(std::move(vals));
      }
    }
  }
}

}  // namespace

extern "C" {

// Parse an in-memory TFRecord buffer of SequenceExamples (one per entity).
void* gdx_seq_parse(const uint8_t* data, int64_t len, const char** ctx_names,
                    int32_t num_ctx, const char* entity_name,
                    const char* idx_name, const char* val_name) {
  auto* h = new SeqHandle();
  for (int32_t i = 0; i < num_ctx; ++i) h->ctx_names.emplace_back(ctx_names[i]);
  h->entity_name = entity_name ? entity_name : "";
  h->idx_name = idx_name ? idx_name : "";
  h->val_name = val_name ? val_name : "";

  const uint8_t* p = data;
  const uint8_t* end = data + len;
  while (p < end) {
    if (p + 12 > end) { delete h; return nullptr; }
    uint64_t rec_len;
    std::memcpy(&rec_len, p, 8);
    p += 12;
    if (p + rec_len + 4 > end) { delete h; return nullptr; }
    Slice payload{p, p + rec_len};
    p += rec_len + 4;
    h->entities.emplace_back();
    SeqParsed* rec = &h->entities.back();
    while (!payload.empty() && payload.ok) {
      uint64_t tag = payload.varint();
      uint32_t fieldno = tag >> 3, wire = tag & 7;
      if (wire != 2) { payload.skip(wire); continue; }
      Slice v = payload.sub(payload.varint());
      if (fieldno == 1) parse_seq_context(v, h, rec);
      else if (fieldno == 2) parse_seq_lists(v, h, rec);
    }
    if (!payload.ok) { delete h; return nullptr; }
    size_t n = std::max(rec->step_idx.size(), rec->step_val.size());
    for (size_t i = 0; i < rec->ctx.size(); ++i)
      n = std::max(n, rec->ctx[i].size());
    rec->n_records = static_cast<int32_t>(n);
    h->total_records += rec->n_records;
    h->total_id_bytes += rec->entity.size();
  }
  return h;
}

int64_t gdx_seq_num_entities(void* handle) {
  return static_cast<SeqHandle*>(handle)->entities.size();
}

int64_t gdx_seq_total_records(void* handle) {
  return static_cast<SeqHandle*>(handle)->total_records;
}

int64_t gdx_seq_id_bytes(void* handle) {
  return static_cast<SeqHandle*>(handle)->total_id_bytes;
}

int32_t gdx_seq_max_nnz(void* handle) {
  return static_cast<SeqHandle*>(handle)->max_nnz;
}

int32_t gdx_seq_has_unknown_context(void* handle) {
  return static_cast<SeqHandle*>(handle)->unknown_context ? 1 : 0;
}

// Per-entity record counts [E] and concatenated utf-8 entity ids
// (offsets [E+1] into buf).
void gdx_seq_fill_meta(void* handle, int32_t* counts, char* id_buf,
                       int64_t* id_offsets) {
  auto* h = static_cast<SeqHandle*>(handle);
  int64_t off = 0;
  for (size_t e = 0; e < h->entities.size(); ++e) {
    counts[e] = h->entities[e].n_records;
    id_offsets[e] = off;
    const std::string& id = h->entities[e].entity;
    std::memcpy(id_buf + off, id.data(), id.size());
    off += id.size();
  }
  id_offsets[h->entities.size()] = off;
}

// Flat context column col: out[total_records] f64, present[E] flags. Entities
// missing the column (or with short lists) contribute zeros.
void gdx_seq_fill_ctx(void* handle, int32_t col, double* out,
                      uint8_t* present) {
  auto* h = static_cast<SeqHandle*>(handle);
  int64_t r = 0;
  for (size_t e = 0; e < h->entities.size(); ++e) {
    const SeqParsed& rec = h->entities[e];
    present[e] = rec.ctx_present[col];
    const auto& v = rec.ctx[col];
    for (int32_t i = 0; i < rec.n_records; ++i)
      out[r + i] = i < static_cast<int32_t>(v.size()) ? v[i] : 0.0;
    r += rec.n_records;
  }
}

void gdx_seq_fill_ctx_i64(void* handle, int32_t col, int64_t* out,
                          uint8_t* present) {
  auto* h = static_cast<SeqHandle*>(handle);
  int64_t r = 0;
  for (size_t e = 0; e < h->entities.size(); ++e) {
    const SeqParsed& rec = h->entities[e];
    present[e] = rec.ctx_present[col];
    const auto& v = rec.ctx_i[col];
    for (int32_t i = 0; i < rec.n_records; ++i)
      out[r + i] = i < static_cast<int32_t>(v.size()) ? v[i] : 0;
    r += rec.n_records;
  }
}

// Flat padded sparse bag: idx/val are [total_records, K] row-major
// (zero-prefilled by the caller), nnz [total_records].
void gdx_seq_fill_sparse(void* handle, int32_t K, int64_t* idx_out,
                         double* val_out, int32_t* nnz_out) {
  auto* h = static_cast<SeqHandle*>(handle);
  int64_t r = 0;
  for (size_t e = 0; e < h->entities.size(); ++e) {
    const SeqParsed& rec = h->entities[e];
    for (int32_t i = 0; i < rec.n_records; ++i) {
      const std::vector<int64_t>* idx =
          i < static_cast<int32_t>(rec.step_idx.size()) ? &rec.step_idx[i]
                                                        : nullptr;
      const std::vector<double>* val =
          i < static_cast<int32_t>(rec.step_val.size()) ? &rec.step_val[i]
                                                        : nullptr;
      int32_t n = idx ? static_cast<int32_t>(idx->size()) : 0;
      if (n > K) n = K;
      nnz_out[r + i] = n;
      for (int32_t j = 0; j < n; ++j) {
        idx_out[(r + i) * K + j] = (*idx)[j];
        val_out[(r + i) * K + j] =
            val && j < static_cast<int32_t>(val->size()) ? (*val)[j] : 0.0;
      }
    }
    r += rec.n_records;
  }
}

void gdx_seq_free(void* handle) { delete static_cast<SeqHandle*>(handle); }

}  // extern "C"
