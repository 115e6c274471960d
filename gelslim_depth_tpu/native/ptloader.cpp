// ptloader — native bulk reader for torch.save zip archives.
//
// The reference's dataset cold start is a single-threaded Python loop of
// torch.load calls (ref general_dataset.py:134-183, its thread-pool path
// is permanently disabled at :18). torch archives store tensor payloads
// uncompressed (ZIP stored entries), so loading is pure IO + memcpy; this
// library turns it into parallel positioned reads straight into
// caller-provided (numpy) buffers, bypassing Python's zipfile data path.
//
// C ABI only — consumed via ctypes (no pybind11 in the image).
//
// Entry points:
//   ptl_read_many: given a file and n (local_header_offset, size, dst)
//     triples, parse each ZIP local header, then pread the payload into
//     dst, fanned out over a thread pool. Returns 0 on success, else the
//     (1-based) index of the first failing entry, negated errno in *err.
//   ptl_version: ABI version stamp.

#include <cstdint>
#include <cstring>
#include <atomic>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

namespace {

struct Entry {
    uint64_t header_offset;
    uint64_t size;
    uint8_t* dst;
};

// Parse the 30-byte ZIP local file header at header_offset and return the
// payload's absolute offset, or 0 on malformed input.
uint64_t payload_offset(int fd, uint64_t header_offset) {
    uint8_t hdr[30];
    if (pread(fd, hdr, 30, (off_t)header_offset) != 30) return 0;
    if (!(hdr[0] == 'P' && hdr[1] == 'K' && hdr[2] == 3 && hdr[3] == 4)) return 0;
    uint16_t name_len, extra_len;
    std::memcpy(&name_len, hdr + 26, 2);
    std::memcpy(&extra_len, hdr + 28, 2);
    return header_offset + 30 + name_len + extra_len;
}

bool read_entry(int fd, const Entry& e) {
    uint64_t off = payload_offset(fd, e.header_offset);
    if (off == 0) return false;
    uint64_t done = 0;
    while (done < e.size) {
        ssize_t got = pread(fd, e.dst + done, e.size - done, (off_t)(off + done));
        if (got <= 0) return false;
        done += (uint64_t)got;
    }
    return true;
}

}  // namespace

extern "C" {

int ptl_version() { return 1; }

// offsets/sizes/dsts: arrays of length n. n_threads <= 0 -> hardware count.
// Returns 0 on success; otherwise 1-based index of the first failed entry.
int ptl_read_many(const char* path, const uint64_t* offsets, const uint64_t* sizes,
                  uint8_t** dsts, int n, int n_threads) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;

    std::vector<Entry> entries((size_t)n);
    for (int i = 0; i < n; ++i) entries[(size_t)i] = Entry{offsets[i], sizes[i], dsts[i]};

    if (n_threads <= 0) {
        n_threads = (int)std::thread::hardware_concurrency();
        if (n_threads <= 0) n_threads = 4;
    }
    if (n_threads > n) n_threads = n;

    std::atomic<int> next{0};
    std::atomic<int> failed{0};
    auto worker = [&]() {
        // each worker reopens the file: independent offsets via pread, but a
        // private fd avoids cross-thread contention on file table locks
        int wfd = open(path, O_RDONLY);
        if (wfd < 0) { failed.store(-1); return; }
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= (int)entries.size()) break;
            if (!read_entry(wfd, entries[(size_t)i])) {
                int expect = 0;
                failed.compare_exchange_strong(expect, i + 1);
            }
        }
        close(wfd);
    };

    if (n_threads <= 1) {
        worker();
    } else {
        std::vector<std::thread> pool;
        pool.reserve((size_t)n_threads);
        for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
        for (auto& th : pool) th.join();
    }
    close(fd);
    return failed.load();
}

}  // extern "C"
