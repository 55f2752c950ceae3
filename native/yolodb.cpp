// YDB native engine: memory-mapped, append-only record store.
//
// C++ implementation of the on-disk format defined in
// yolov3_tpu/data/store.py (magic "YDBSTOR1"; data log of
// [u32 klen][u64 vlen][key][value] records; footer index of
// [u32 klen][key][u64 value_offset][u64 vlen]). Databases written by either
// implementation open in both.
//
// This is the framework's native runtime component: the data-loader's hot
// read path (many worker processes doing random-key lookups while feeding
// the TPU) goes through mmap'd zero-copy reads here instead of Python-level
// file handling — the role the LMDB C library plays for the reference
// (reference/imagereader.py:103,348).
//
// Build: see native/build.sh (g++ -O2 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr char kMagic[] = "YDBSTOR1";
constexpr size_t kMagicLen = 8;
constexpr const char* kDataFile = "/data.ydb";
constexpr const char* kIndexFile = "/index.ydb";

struct Entry {
  uint64_t offset;
  uint64_t length;
};

struct Reader {
  int fd = -1;
  const uint8_t* map = nullptr;
  size_t map_len = 0;
  std::vector<std::pair<const uint8_t*, uint32_t>> keys;  // insertion order
  // keys view into the mmap'd data log (live as long as the Reader), so
  // lookups never allocate
  std::unordered_map<std::string_view, Entry> table;
};

struct Writer {
  FILE* fh = nullptr;
  std::string db_path;
  uint64_t offset = 0;
  std::vector<std::pair<std::string, Entry>> index;
};

bool load_index(Reader* r, const std::string& idx_path) {
  FILE* fh = std::fopen(idx_path.c_str(), "rb");
  if (!fh) return false;
  std::fseek(fh, 0, SEEK_END);
  long size = std::ftell(fh);
  std::fseek(fh, 0, SEEK_SET);
  if (size < (long)(kMagicLen + 8)) { std::fclose(fh); return false; }
  std::vector<uint8_t> blob(size);
  if (std::fread(blob.data(), 1, size, fh) != (size_t)size) {
    std::fclose(fh);
    return false;
  }
  std::fclose(fh);
  if (std::memcmp(blob.data(), kMagic, kMagicLen) != 0) return false;

  size_t pos = kMagicLen;
  uint64_t count;
  std::memcpy(&count, blob.data() + pos, 8);
  pos += 8;
  r->keys.reserve(count);
  r->table.reserve(count);
  for (uint64_t i = 0; i < count; ++i) {
    if (pos + 4 > blob.size()) return false;
    uint32_t klen;
    std::memcpy(&klen, blob.data() + pos, 4);
    pos += 4;
    if (pos + klen + 16 > blob.size()) return false;
    const uint8_t* blob_key = blob.data() + pos;
    pos += klen;
    Entry e;
    std::memcpy(&e.offset, blob.data() + pos, 8);
    std::memcpy(&e.length, blob.data() + pos + 8, 8);
    pos += 16;
    if (e.offset + e.length > r->map_len) return false;  // stale
    // the value at offset is preceded in the log by its key bytes
    // (scan_log layout: [klen][vlen][key][value]); bounds-check the
    // implied key position BEFORE dereferencing, and verify the log's
    // key bytes match the index's copy — a truncated rewrite or an index
    // paired with the wrong data log must fail load, not corrupt lookups
    if (e.offset < kMagicLen + 12 + (uint64_t)klen) return false;
    const uint8_t* kptr = r->map + e.offset - klen;
    if (std::memcmp(kptr, blob_key, klen) != 0) return false;
    r->keys.emplace_back(kptr, klen);
    r->table.emplace(std::string_view((const char*)kptr, klen), e);
  }
  return true;
}

void scan_log(Reader* r) {
  size_t pos = kMagicLen;
  const size_t end = r->map_len;
  while (pos + 12 <= end) {
    uint32_t klen;
    uint64_t vlen;
    std::memcpy(&klen, r->map + pos, 4);
    std::memcpy(&vlen, r->map + pos + 4, 8);
    pos += 12;
    if (pos + klen + vlen > end) break;  // truncated tail
    const uint8_t* kptr = r->map + pos;
    pos += klen;
    Entry e{(uint64_t)pos, vlen};
    r->keys.emplace_back(kptr, klen);
    r->table.emplace(std::string_view((const char*)kptr, klen), e);
    pos += vlen;
  }
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Reader API
// ---------------------------------------------------------------------------

void* ydb_reader_open(const char* db_path) {
  std::string base(db_path);
  std::string data_path = base + kDataFile;
  int fd = ::open(data_path.c_str(), O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || (size_t)st.st_size < kMagicLen) {
    ::close(fd);
    return nullptr;
  }
  void* map = mmap(nullptr, st.st_size, PROT_READ, MAP_SHARED, fd, 0);
  if (map == MAP_FAILED) {
    ::close(fd);
    return nullptr;
  }
  if (std::memcmp(map, kMagic, kMagicLen) != 0) {
    munmap(map, st.st_size);
    ::close(fd);
    return nullptr;
  }
  auto* r = new Reader;
  r->fd = fd;
  r->map = (const uint8_t*)map;
  r->map_len = st.st_size;
  // advise the kernel we'll do random-key access
  madvise(map, st.st_size, MADV_RANDOM);
  if (!load_index(r, base + kIndexFile)) {
    r->keys.clear();
    r->table.clear();
    scan_log(r);
  }
  return r;
}

uint64_t ydb_reader_count(void* h) {
  return ((Reader*)h)->keys.size();
}

int ydb_reader_key(void* h, uint64_t i, const char** key, uint32_t* klen) {
  auto* r = (Reader*)h;
  if (i >= r->keys.size()) return -1;
  *key = (const char*)r->keys[i].first;
  *klen = r->keys[i].second;
  return 0;
}

int ydb_reader_get(void* h, const char* key, uint32_t klen, const char** val,
                   uint64_t* vlen) {
  auto* r = (Reader*)h;
  auto it = r->table.find(std::string_view(key, klen));
  if (it == r->table.end()) return -1;
  *val = (const char*)(r->map + it->second.offset);
  *vlen = it->second.length;
  return 0;
}

// Expose the data-log mapping so bindings can serve zero-copy slices of ONE
// long-lived buffer (per-result pointer wrapping in Python costs more than
// the lookup itself).
void ydb_reader_map(void* h, const char** base, uint64_t* len) {
  auto* r = (Reader*)h;
  *base = (const char*)r->map;
  *len = r->map_len;
}

// Batched lookup amortizing the FFI call: `keys` is the concatenation of n
// key byte strings whose lengths are in `klens`. For each key i, offsets[i]
// receives the value offset into the data-log mapping (0 = missing; real
// values always sit past the file header) and vlens[i] its length.
// Returns the number of keys found.
uint64_t ydb_reader_get_batch(void* h, const char* keys,
                              const uint32_t* klens, uint64_t n,
                              uint64_t* offsets, uint64_t* vlens) {
  auto* r = (Reader*)h;
  uint64_t found = 0;
  const char* kp = keys;
  for (uint64_t i = 0; i < n; ++i) {
    auto it = r->table.find(std::string_view(kp, klens[i]));
    kp += klens[i];
    if (it == r->table.end()) {
      offsets[i] = 0;
      vlens[i] = 0;
    } else {
      offsets[i] = it->second.offset;
      vlens[i] = it->second.length;
      ++found;
    }
  }
  return found;
}

void ydb_reader_close(void* h) {
  auto* r = (Reader*)h;
  if (r->map) munmap((void*)r->map, r->map_len);
  if (r->fd >= 0) ::close(r->fd);
  delete r;
}

// ---------------------------------------------------------------------------
// Writer API
// ---------------------------------------------------------------------------

void* ydb_writer_open(const char* db_path) {
  std::string base(db_path);
  if (mkdir(base.c_str(), 0755) != 0) return nullptr;  // must not pre-exist
  FILE* fh = std::fopen((base + kDataFile).c_str(), "wb");
  if (!fh) return nullptr;
  if (std::fwrite(kMagic, 1, kMagicLen, fh) != kMagicLen) {
    std::fclose(fh);
    return nullptr;
  }
  auto* w = new Writer;
  w->fh = fh;
  w->db_path = base;
  w->offset = kMagicLen;
  return w;
}

int ydb_writer_put(void* h, const char* key, uint32_t klen, const char* val,
                   uint64_t vlen) {
  auto* w = (Writer*)h;
  if (std::fwrite(&klen, 4, 1, w->fh) != 1) return -1;
  if (std::fwrite(&vlen, 8, 1, w->fh) != 1) return -1;
  if (klen && std::fwrite(key, 1, klen, w->fh) != klen) return -1;
  if (vlen && std::fwrite(val, 1, vlen, w->fh) != vlen) return -1;
  uint64_t val_off = w->offset + 12 + klen;
  w->index.emplace_back(std::string(key, klen), Entry{val_off, vlen});
  w->offset = val_off + vlen;
  return 0;
}

int ydb_writer_flush(void* h) {
  auto* w = (Writer*)h;
  if (std::fflush(w->fh) != 0) return -1;
  return fsync(fileno(w->fh));
}

int ydb_writer_close(void* h) {
  auto* w = (Writer*)h;
  std::fflush(w->fh);
  fsync(fileno(w->fh));
  std::fclose(w->fh);

  int rc = 0;
  FILE* idx = std::fopen((w->db_path + kIndexFile).c_str(), "wb");
  if (idx) {
    uint64_t count = w->index.size();
    std::fwrite(kMagic, 1, kMagicLen, idx);
    std::fwrite(&count, 8, 1, idx);
    for (const auto& [key, e] : w->index) {
      uint32_t klen = key.size();
      std::fwrite(&klen, 4, 1, idx);
      std::fwrite(key.data(), 1, klen, idx);
      std::fwrite(&e.offset, 8, 1, idx);
      std::fwrite(&e.length, 8, 1, idx);
    }
    std::fclose(idx);
  } else {
    rc = -1;
  }
  delete w;
  return rc;
}

}  // extern "C"
