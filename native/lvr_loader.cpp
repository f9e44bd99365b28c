// lvr_loader: native feature-cache / data-loader runtime.
//
// The reference loads one .pt file per sample per step in Python
// (`llava/train/train.py:807` torch.load in LazyFeatureDataset,
// `C_score/pck_train.py:39` per-pair torch.load). This library provides the
// TPU-framework equivalent of that IO path as native code:
//
//  - npy header parsing (fp32/fp16, C-order),
//  - lvr_batch_load: a pthread pool that reads N .npy files straight into
//    one contiguous host batch buffer (ready for a single device upload),
//  - packed caches: lvr_pack converts a directory of .npy files into one
//    contiguous .lvrpack file + index; lvr_pack_open / lvr_pack_gather do
//    random-access batched gathers out of it (page-cache friendly, no
//    per-file open/stat cost).
//
// Exposed through a plain C ABI consumed via ctypes
// (law_of_vision_representation_in_mllms_tpu/io/native_cache.py).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <fcntl.h>
#include <pthread.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// npy parsing
// ---------------------------------------------------------------------------

// Parses a .npy v1/v2 header. Returns payload offset, or -1 on error.
// dtype_code: 0 = float32, 1 = float16, 2 = int32. shape/out ndim filled.
static long parse_npy_header(const unsigned char* buf, size_t len,
                             int* dtype_code, int64_t* shape, int* ndim) {
  if (len < 10 || memcmp(buf, "\x93NUMPY", 6) != 0) return -1;
  int major = buf[6];
  size_t header_len, offset;
  if (major == 1) {
    header_len = buf[8] | (buf[9] << 8);
    offset = 10;
  } else {
    header_len = buf[8] | (buf[9] << 8) | (buf[10] << 16) |
                 ((size_t)buf[11] << 24);
    offset = 12;
  }
  if (offset + header_len > len) return -1;
  std::string h((const char*)buf + offset, header_len);

  if (h.find("'fortran_order': True") != std::string::npos) return -1;
  if (h.find("<f4") != std::string::npos) *dtype_code = 0;
  else if (h.find("<f2") != std::string::npos) *dtype_code = 1;
  else if (h.find("<i4") != std::string::npos) *dtype_code = 2;
  else return -1;

  size_t sp = h.find("'shape':");
  if (sp == std::string::npos) return -1;
  sp = h.find('(', sp);
  size_t ep = h.find(')', sp);
  if (sp == std::string::npos || ep == std::string::npos) return -1;
  std::string dims = h.substr(sp + 1, ep - sp - 1);
  *ndim = 0;
  const char* p = dims.c_str();
  while (*p && *ndim < 8) {
    while (*p == ' ' || *p == ',') p++;
    if (!*p) break;
    shape[(*ndim)++] = strtoll(p, (char**)&p, 10);
  }
  return (long)(offset + header_len);
}

// Reads one .npy file; copies payload into out (capacity out_bytes).
// Returns bytes copied, or -1.
static long load_npy_into(const char* path, unsigned char* out,
                          size_t out_bytes) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return -1; }
  size_t len = (size_t)st.st_size;
  unsigned char* m =
      (unsigned char*)mmap(nullptr, len, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (m == MAP_FAILED) return -1;
  int dtype, ndim;
  int64_t shape[8];
  long off = parse_npy_header(m, len, &dtype, shape, &ndim);
  long copied = -1;
  if (off >= 0) {
    size_t payload = len - (size_t)off;
    if (payload <= out_bytes) {
      memcpy(out, m + off, payload);
      copied = (long)payload;
    }
  }
  munmap(m, len);
  return copied;
}

int lvr_npy_info(const char* path, int64_t* shape, int* ndim,
                 int* dtype_code) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  unsigned char head[4096];
  ssize_t n = read(fd, head, sizeof(head));
  close(fd);
  if (n <= 0) return -1;
  return parse_npy_header(head, (size_t)n, dtype_code, shape, ndim) >= 0
             ? 0 : -1;
}

// ---------------------------------------------------------------------------
// threaded batch load
// ---------------------------------------------------------------------------

struct BatchJob {
  const char** paths;
  unsigned char* out;
  size_t item_bytes;
  int n;
  int n_threads;
  int next;            // guarded by mu
  int failures;
  pthread_mutex_t mu;
};

static void* batch_worker(void* arg) {
  BatchJob* job = (BatchJob*)arg;
  for (;;) {
    pthread_mutex_lock(&job->mu);
    int i = job->next++;
    pthread_mutex_unlock(&job->mu);
    if (i >= job->n) break;
    long got = load_npy_into(job->paths[i], job->out + (size_t)i *
                             job->item_bytes, job->item_bytes);
    if (got < 0) {
      pthread_mutex_lock(&job->mu);
      job->failures++;
      pthread_mutex_unlock(&job->mu);
    }
  }
  return nullptr;
}

// Load n .npy files (each exactly item_bytes of payload) into out.
// Returns number of failures (0 = success).
int lvr_batch_load(const char** paths, int n, unsigned char* out,
                   int64_t item_bytes, int n_threads) {
  if (n_threads < 1) n_threads = 1;
  if (n_threads > n) n_threads = n;
  BatchJob job{paths, out, (size_t)item_bytes, n, n_threads, 0, 0,
               PTHREAD_MUTEX_INITIALIZER};
  std::vector<pthread_t> threads((size_t)n_threads);
  for (int t = 0; t < n_threads; t++)
    pthread_create(&threads[(size_t)t], nullptr, batch_worker, &job);
  for (int t = 0; t < n_threads; t++)
    pthread_join(threads[(size_t)t], nullptr);
  return job.failures;
}

// ---------------------------------------------------------------------------
// packed cache: one contiguous file + int64 index
// layout: [magic u64][count u64][item_bytes u64][payload...]
// ---------------------------------------------------------------------------

static const uint64_t kMagic = 0x4c56525041434b31ULL;  // "LVRPACK1"

int lvr_pack(const char** paths, int n, int64_t item_bytes,
             const char* out_path, int n_threads) {
  size_t total = 24 + (size_t)n * (size_t)item_bytes;
  int fd = open(out_path, O_RDWR | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return -1;
  if (ftruncate(fd, (off_t)total) != 0) { close(fd); return -1; }
  unsigned char* m = (unsigned char*)mmap(nullptr, total,
                                          PROT_READ | PROT_WRITE,
                                          MAP_SHARED, fd, 0);
  close(fd);
  if (m == MAP_FAILED) return -1;
  uint64_t hdr[3] = {kMagic, (uint64_t)n, (uint64_t)item_bytes};
  memcpy(m, hdr, 24);
  int fails = lvr_batch_load(paths, n, m + 24, item_bytes, n_threads);
  munmap(m, total);
  return fails;
}

struct Pack {
  unsigned char* base;
  size_t len;
  uint64_t count;
  uint64_t item_bytes;
};

void* lvr_pack_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
  unsigned char* m = (unsigned char*)mmap(nullptr, (size_t)st.st_size,
                                          PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (m == MAP_FAILED) return nullptr;
  uint64_t hdr[3];
  memcpy(hdr, m, 24);
  if (hdr[0] != kMagic) { munmap(m, (size_t)st.st_size); return nullptr; }
  Pack* p = new Pack{m, (size_t)st.st_size, hdr[1], hdr[2]};
  return p;
}

int64_t lvr_pack_count(void* handle) {
  return handle ? (int64_t)((Pack*)handle)->count : -1;
}

int64_t lvr_pack_item_bytes(void* handle) {
  return handle ? (int64_t)((Pack*)handle)->item_bytes : -1;
}

// Gather k items by index into out (contiguous).
int lvr_pack_gather(void* handle, const int64_t* indices, int k,
                    unsigned char* out) {
  Pack* p = (Pack*)handle;
  if (!p) return -1;
  for (int i = 0; i < k; i++) {
    uint64_t idx = (uint64_t)indices[i];
    if (idx >= p->count) return -1;
    memcpy(out + (size_t)i * p->item_bytes,
           p->base + 24 + idx * p->item_bytes, p->item_bytes);
  }
  return 0;
}

void lvr_pack_close(void* handle) {
  Pack* p = (Pack*)handle;
  if (!p) return;
  munmap(p->base, p->len);
  delete p;
}

}  // extern "C"
