// TLMC-style columnar telemetry log codec (native runtime component).
//
// Role-equivalent to the reference's C++ telemetry export/read-back stack
// (core/src/telemetry/telemetry_recorder.cc + the TLMC format described in
// docs/spec/src/tlmc_format_specification.md: column chunks, shuffle filter,
// zlib compression).  Re-designed as a standalone zero-dependency C++ library
// exposed through a C ABI for ctypes: the hot path (byte-shuffle + deflate of
// float columns) runs natively off the device thread while the TPU keeps
// stepping.
//
// File layout (little-endian):
//   magic  "JTL1"
//   u32    n_constants
//     per constant: u32 klen, key bytes, u64 vlen, value bytes
//   u32    n_vars
//     per var: u32 nlen, name bytes, u8 dtype (0=f32,1=f64,2=i64), u64 nrows,
//              u64 comp_size, comp bytes  (byte-shuffled then deflated column)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#include <zlib.h>

namespace {

constexpr char kMagic[4] = {'J', 'T', 'L', '1'};

size_t dtype_size(uint8_t dt) { return dt == 0 ? 4 : 8; }

// HDF5-style byte shuffle: gather byte k of every element together.
void shuffle_bytes(const uint8_t* src, uint8_t* dst, size_t n_elems, size_t elem_size) {
    for (size_t b = 0; b < elem_size; ++b) {
        const uint8_t* s = src + b;
        uint8_t* d = dst + b * n_elems;
        for (size_t i = 0; i < n_elems; ++i) {
            d[i] = s[i * elem_size];
        }
    }
}

void unshuffle_bytes(const uint8_t* src, uint8_t* dst, size_t n_elems, size_t elem_size) {
    for (size_t b = 0; b < elem_size; ++b) {
        const uint8_t* s = src + b * n_elems;
        uint8_t* d = dst + b;
        for (size_t i = 0; i < n_elems; ++i) {
            d[i * elem_size] = s[i];
        }
    }
}

bool write_all(FILE* f, const void* p, size_t n) { return fwrite(p, 1, n, f) == n; }
bool read_all(FILE* f, void* p, size_t n) { return fread(p, 1, n, f) == n; }

struct Column {
    std::string name;
    uint8_t dtype;
    uint64_t nrows;
    std::vector<uint8_t> data;  // decoded
};

struct LogFile {
    std::vector<std::pair<std::string, std::string>> constants;
    std::vector<Column> columns;
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Writer
// ---------------------------------------------------------------------------

// Returns 0 on success.
int tlmc_write(const char* path,
               const char** const_keys,
               const char** const_vals,
               const uint64_t* const_val_lens,
               int32_t n_constants,
               const char** var_names,
               const void** var_data,
               const uint8_t* var_dtypes,
               const uint64_t* var_rows,
               int32_t n_vars,
               int32_t compress_level) {
    FILE* f = fopen(path, "wb");
    if (!f) return 1;
    int err = 0;
    std::vector<uint8_t> shuf, comp;
    do {
        if (!write_all(f, kMagic, 4)) { err = 2; break; }
        uint32_t nc = static_cast<uint32_t>(n_constants);
        if (!write_all(f, &nc, 4)) { err = 2; break; }
        for (int32_t i = 0; i < n_constants && !err; ++i) {
            uint32_t klen = static_cast<uint32_t>(strlen(const_keys[i]));
            uint64_t vlen = const_val_lens[i];
            if (!write_all(f, &klen, 4) || !write_all(f, const_keys[i], klen) ||
                !write_all(f, &vlen, 8) || !write_all(f, const_vals[i], vlen)) {
                err = 2;
            }
        }
        if (err) break;
        uint32_t nv = static_cast<uint32_t>(n_vars);
        if (!write_all(f, &nv, 4)) { err = 2; break; }
        for (int32_t i = 0; i < n_vars && !err; ++i) {
            uint32_t nlen = static_cast<uint32_t>(strlen(var_names[i]));
            uint8_t dt = var_dtypes[i];
            uint64_t rows = var_rows[i];
            size_t esize = dtype_size(dt);
            size_t nbytes = rows * esize;
            shuf.resize(nbytes);
            shuffle_bytes(static_cast<const uint8_t*>(var_data[i]), shuf.data(), rows,
                          esize);
            uLongf bound = compressBound(nbytes);
            comp.resize(bound);
            if (compress2(comp.data(), &bound, shuf.data(), nbytes,
                          compress_level) != Z_OK) {
                err = 3;
                break;
            }
            uint64_t csize = bound;
            if (!write_all(f, &nlen, 4) || !write_all(f, var_names[i], nlen) ||
                !write_all(f, &dt, 1) || !write_all(f, &rows, 8) ||
                !write_all(f, &csize, 8) || !write_all(f, comp.data(), csize)) {
                err = 2;
            }
        }
    } while (false);
    fclose(f);
    if (err) remove(path);
    return err;
}

// ---------------------------------------------------------------------------
// Reader
// ---------------------------------------------------------------------------

void* tlmc_open(const char* path) {
    FILE* f = fopen(path, "rb");
    if (!f) return nullptr;
    auto* log = new LogFile();
    bool ok = false;
    std::vector<uint8_t> comp, shuf;
    do {
        char magic[4];
        if (!read_all(f, magic, 4) || memcmp(magic, kMagic, 4) != 0) break;
        uint32_t nc;
        if (!read_all(f, &nc, 4)) break;
        bool fail = false;
        for (uint32_t i = 0; i < nc && !fail; ++i) {
            uint32_t klen;
            uint64_t vlen;
            if (!read_all(f, &klen, 4)) { fail = true; break; }
            std::string key(klen, '\0');
            if (!read_all(f, key.data(), klen) || !read_all(f, &vlen, 8)) {
                fail = true;
                break;
            }
            std::string val(vlen, '\0');
            if (!read_all(f, val.data(), vlen)) { fail = true; break; }
            log->constants.emplace_back(std::move(key), std::move(val));
        }
        if (fail) break;
        uint32_t nv;
        if (!read_all(f, &nv, 4)) break;
        for (uint32_t i = 0; i < nv && !fail; ++i) {
            uint32_t nlen;
            if (!read_all(f, &nlen, 4)) { fail = true; break; }
            Column col;
            col.name.resize(nlen);
            uint64_t csize;
            if (!read_all(f, col.name.data(), nlen) || !read_all(f, &col.dtype, 1) ||
                !read_all(f, &col.nrows, 8) || !read_all(f, &csize, 8)) {
                fail = true;
                break;
            }
            comp.resize(csize);
            if (!read_all(f, comp.data(), csize)) { fail = true; break; }
            size_t esize = dtype_size(col.dtype);
            size_t nbytes = col.nrows * esize;
            shuf.resize(nbytes);
            uLongf dlen = nbytes;
            if (uncompress(shuf.data(), &dlen, comp.data(), csize) != Z_OK ||
                dlen != nbytes) {
                fail = true;
                break;
            }
            col.data.resize(nbytes);
            unshuffle_bytes(shuf.data(), col.data.data(), col.nrows, esize);
            log->columns.push_back(std::move(col));
        }
        ok = !fail;
    } while (false);
    fclose(f);
    if (!ok) {
        delete log;
        return nullptr;
    }
    return log;
}

void tlmc_close(void* handle) { delete static_cast<LogFile*>(handle); }

int32_t tlmc_num_constants(void* handle) {
    return static_cast<int32_t>(static_cast<LogFile*>(handle)->constants.size());
}

const char* tlmc_constant_key(void* handle, int32_t i) {
    return static_cast<LogFile*>(handle)->constants[i].first.c_str();
}

const char* tlmc_constant_value(void* handle, int32_t i, uint64_t* len) {
    auto& v = static_cast<LogFile*>(handle)->constants[i].second;
    *len = v.size();
    return v.data();
}

int32_t tlmc_num_vars(void* handle) {
    return static_cast<int32_t>(static_cast<LogFile*>(handle)->columns.size());
}

const char* tlmc_var_name(void* handle, int32_t i) {
    return static_cast<LogFile*>(handle)->columns[i].name.c_str();
}

uint8_t tlmc_var_dtype(void* handle, int32_t i) {
    return static_cast<LogFile*>(handle)->columns[i].dtype;
}

uint64_t tlmc_var_rows(void* handle, int32_t i) {
    return static_cast<LogFile*>(handle)->columns[i].nrows;
}

// Copies the decoded column into `out` (caller allocates rows*dtype_size bytes).
void tlmc_var_read(void* handle, int32_t i, void* out) {
    auto& col = static_cast<LogFile*>(handle)->columns[i];
    memcpy(out, col.data.data(), col.data.size());
}

}  // extern "C"
