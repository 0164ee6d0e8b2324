// Threaded frame writer pool — the output-side counterpart of
// frame_pump.cpp. PNG/JPEG encoding is CPU-bound (~10-20 ms per 1080p
// frame) and Python-side cv2.imwrite serializes on the GIL, capping a
// file sink far below the chain's throughput; this pool encodes and
// writes on N worker threads behind a bounded queue (submit blocks when
// full, giving natural backpressure to the stream runner).
//
// C ABI (ctypes-bound from raw_image_pipeline_tpu/runtime/native.py):
//   fs_create(n_threads, queue_cap)            -> handle
//   fs_submit(h, path, data, height, width, ch) -> 0 ok (copies `data`)
//   fs_flush(h)                                -> number of failed writes
//   fs_destroy(h)
//
// Encoding is by file extension via cv::imwrite (.png/.jpg/...); a ".raw"
// extension writes the bytes verbatim (no OpenCV involved).

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>

namespace {

struct Job {
  std::string path;
  std::vector<uint8_t> data;
  int h, w, c;
};

struct Sink {
  std::deque<Job> queue;
  std::mutex mu;
  std::condition_variable cv_submit;  // space available
  std::condition_variable cv_work;    // work available / drained
  size_t cap = 64;
  bool closing = false;
  int in_flight = 0;  // jobs dequeued but not yet written
  long failures = 0;
  std::vector<std::thread> workers;

  void worker() {
    for (;;) {
      Job job;
      {
        std::unique_lock<std::mutex> lk(mu);
        cv_work.wait(lk, [&] { return closing || !queue.empty(); });
        if (queue.empty()) return;  // closing and drained
        job = std::move(queue.front());
        queue.pop_front();
        ++in_flight;
        cv_submit.notify_one();
      }
      bool ok = write_one(job);
      {
        std::unique_lock<std::mutex> lk(mu);
        --in_flight;
        if (!ok) ++failures;
        cv_work.notify_all();  // flush() waits on empty queue + no in-flight
      }
    }
  }

  static bool write_one(const Job& job) {
    const std::string& p = job.path;
    if (p.size() >= 4 && p.compare(p.size() - 4, 4, ".raw") == 0) {
      FILE* f = std::fopen(p.c_str(), "wb");
      if (!f) return false;
      size_t n = std::fwrite(job.data.data(), 1, job.data.size(), f);
      std::fclose(f);
      return n == job.data.size();
    }
    try {
      cv::Mat m(job.h, job.w, job.c == 1 ? CV_8UC1 : CV_8UC3,
                const_cast<uint8_t*>(job.data.data()));
      return cv::imwrite(p, m);
    } catch (...) {
      return false;
    }
  }
};

}  // namespace

extern "C" {

void* fs_create(int n_threads, int queue_cap) {
  auto* s = new Sink();
  if (queue_cap > 0) s->cap = static_cast<size_t>(queue_cap);
  if (n_threads < 1) n_threads = 1;
  for (int i = 0; i < n_threads; ++i) {
    s->workers.emplace_back([s] { s->worker(); });
  }
  return s;
}

int fs_submit(void* h, const char* path, const uint8_t* data, int height,
              int width, int channels) {
  auto* s = static_cast<Sink*>(h);
  if (!s || !path || !data || height <= 0 || width <= 0 ||
      (channels != 1 && channels != 3)) {
    return -1;
  }
  size_t nbytes = static_cast<size_t>(height) * width * channels;
  Job job{path, std::vector<uint8_t>(data, data + nbytes), height, width,
          channels};
  std::unique_lock<std::mutex> lk(s->mu);
  s->cv_submit.wait(lk, [&] { return s->closing || s->queue.size() < s->cap; });
  if (s->closing) return -2;
  s->queue.push_back(std::move(job));
  s->cv_work.notify_one();
  return 0;
}

long fs_flush(void* h) {
  auto* s = static_cast<Sink*>(h);
  std::unique_lock<std::mutex> lk(s->mu);
  s->cv_work.wait(lk, [&] { return s->queue.empty() && s->in_flight == 0; });
  return s->failures;
}

void fs_destroy(void* h) {
  auto* s = static_cast<Sink*>(h);
  {
    std::unique_lock<std::mutex> lk(s->mu);
    s->closing = true;
    s->cv_work.notify_all();
    s->cv_submit.notify_all();
  }
  for (auto& t : s->workers) t.join();
  delete s;
}

}  // extern "C"
