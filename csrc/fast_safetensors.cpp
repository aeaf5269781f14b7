// Fast safetensors payload reader for the training data loader.
//
// The cache hot path reads two small safetensors files per sample
// (latents + text embeddings).  The Python reader pays JSON header parsing
// + file-object overhead per read; this native reader mmaps the file,
// locates a tensor's byte range with a single linear header scan (no JSON
// library needed for the flat safetensors header schema), and memcpys into
// a caller-provided buffer.  Exposed through ctypes (csrc/__init__ wrapper
// at aozora_sdxl_training_tpu/data/fast_io.py) with a pure-Python fallback.
//
// The reference's equivalent layer is torch.load pickle deserialization
// (/root/reference/training_utils/caching/cache.py:83-88); this replaces it
// with zero-copy IO suited to feeding device transfers.

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <string>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

struct MappedFile {
    const uint8_t* data = nullptr;
    size_t size = 0;
    int fd = -1;
};

bool map_file(const char* path, MappedFile* out) {
    int fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (::fstat(fd, &st) != 0 || st.st_size < 8) {
        ::close(fd);
        return false;
    }
    void* mem = ::mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (mem == MAP_FAILED) {
        ::close(fd);
        return false;
    }
    out->data = static_cast<const uint8_t*>(mem);
    out->size = static_cast<size_t>(st.st_size);
    out->fd = fd;
    return true;
}

void unmap_file(MappedFile* f) {
    if (f->data) ::munmap(const_cast<uint8_t*>(f->data), f->size);
    if (f->fd >= 0) ::close(f->fd);
    f->data = nullptr;
    f->size = 0;
    f->fd = -1;
}

// Scan the JSON header for "<name>": {... "data_offsets":[a,b] ...}.
// The safetensors header is a flat one-level object, so a quoted-key scan
// with brace matching is sufficient (keys cannot contain unescaped quotes).
bool find_offsets(const char* header, size_t header_len,
                  const char* name, uint64_t* begin, uint64_t* end) {
    const std::string needle = std::string("\"") + name + "\"";
    size_t pos = 0;
    const std::string h(header, header_len);
    while ((pos = h.find(needle, pos)) != std::string::npos) {
        size_t after = pos + needle.size();
        // must be a top-level key: next non-space char is ':'
        size_t c = after;
        while (c < h.size() && (h[c] == ' ' || h[c] == '\n')) c++;
        if (c >= h.size() || h[c] != ':') { pos = after; continue; }
        // value must be an object
        while (c < h.size() && h[c] != '{') c++;
        if (c >= h.size()) return false;
        size_t obj_start = c;
        int depth = 0;
        size_t obj_end = obj_start;
        for (; obj_end < h.size(); ++obj_end) {
            if (h[obj_end] == '{') depth++;
            else if (h[obj_end] == '}') { depth--; if (depth == 0) break; }
        }
        const std::string obj = h.substr(obj_start, obj_end - obj_start + 1);
        size_t off = obj.find("\"data_offsets\"");
        if (off == std::string::npos) { pos = obj_end; continue; }
        const char* p = obj.c_str() + off;
        while (*p && *p != '[') p++;
        if (!*p) return false;
        unsigned long long a = 0, b = 0;
        if (std::sscanf(p, "[%llu,%llu", &a, &b) != 2) return false;
        *begin = a;
        *end = b;
        return true;
    }
    return false;
}

}  // namespace

extern "C" {

// Read one tensor's raw bytes into out (caller allocates out_capacity bytes).
// Returns the number of bytes copied, 0 if the tensor is missing, or -1 on
// file/format errors.  Thread-safe (no shared state).
long long fast_st_read_tensor(const char* path, const char* name,
                              uint8_t* out, long long out_capacity) {
    MappedFile f;
    if (!map_file(path, &f)) return -1;
    uint64_t header_len = 0;
    std::memcpy(&header_len, f.data, 8);
    if (8 + header_len > f.size) { unmap_file(&f); return -1; }

    uint64_t begin = 0, end = 0;
    bool ok = find_offsets(reinterpret_cast<const char*>(f.data + 8),
                           header_len, name, &begin, &end);
    if (!ok) { unmap_file(&f); return 0; }
    const uint64_t data_base = 8 + header_len;
    if (end < begin || data_base + end > f.size) { unmap_file(&f); return -1; }
    const uint64_t nbytes = end - begin;
    if (static_cast<long long>(nbytes) > out_capacity) {
        unmap_file(&f);
        return -1;
    }
    std::memcpy(out, f.data + data_base + begin, nbytes);
    unmap_file(&f);
    return static_cast<long long>(nbytes);
}

// Return the byte length of one tensor (0 = missing, -1 = error).
long long fast_st_tensor_nbytes(const char* path, const char* name) {
    MappedFile f;
    if (!map_file(path, &f)) return -1;
    uint64_t header_len = 0;
    std::memcpy(&header_len, f.data, 8);
    if (8 + header_len > f.size) { unmap_file(&f); return -1; }
    uint64_t begin = 0, end = 0;
    bool ok = find_offsets(reinterpret_cast<const char*>(f.data + 8),
                           header_len, name, &begin, &end);
    unmap_file(&f);
    if (!ok) return 0;
    return static_cast<long long>(end - begin);
}

}  // extern "C"
