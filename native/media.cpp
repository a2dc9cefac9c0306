// libtpurmedia — native media runtime for libnativecpurenderer_tpu.
//
// Host-side I/O for the TPU renderer: compressed-audio decode and MP4
// (H.264 + AAC) encode, built on FFmpeg's libav* like the reference's
// VideoCap (libNativeCPURenderer.cpp:65-275) but with an independent,
// threaded design:
//
//   * the video encode path runs on a worker thread behind a bounded frame
//     queue, so the TPU render loop overlaps with x264;
//   * audio muxing actually works as a standalone call (the reference
//     declares PutAudioIntoVideoCap but never defines it, h:142);
//   * the audio tail shorter than one AAC frame is zero-padded instead of
//     dropped (reference drops it at cpp:153).
//
// C ABI only — consumed from Python via ctypes (media.py).

#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <deque>
#include <mutex>
#include <thread>
#include <vector>

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/avutil.h>
#include <libavutil/opt.h>
#include <libswresample/swresample.h>
#include <libswscale/swscale.h>
}

namespace {

const char* err2str(int err) {
    static thread_local char buf[AV_ERROR_MAX_STRING_SIZE];
    av_strerror(err, buf, sizeof(buf));
    return buf;
}

#define LOGE(...) std::fprintf(stderr, "[tpurmedia] " __VA_ARGS__)

}  // namespace

// ---------------------------------------------------------------------------
// audio decode: any container/codec -> interleaved f32
// ---------------------------------------------------------------------------

extern "C" float* MediaDecodeAudio(const char* path, long long* out_rate,
                                   long long* out_channels,
                                   long long* out_frames) {
    AVFormatContext* fmt = nullptr;
    if (avformat_open_input(&fmt, path, nullptr, nullptr) < 0) {
        LOGE("open_input failed: %s\n", path);
        return nullptr;
    }
    if (avformat_find_stream_info(fmt, nullptr) < 0) {
        avformat_close_input(&fmt);
        return nullptr;
    }
    const AVCodec* dec = nullptr;
    int sidx = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &dec, 0);
    if (sidx < 0 || !dec) {
        avformat_close_input(&fmt);
        return nullptr;
    }
    AVCodecContext* ctx = avcodec_alloc_context3(dec);
    avcodec_parameters_to_context(ctx, fmt->streams[sidx]->codecpar);
    if (avcodec_open2(ctx, dec, nullptr) < 0) {
        avcodec_free_context(&ctx);
        avformat_close_input(&fmt);
        return nullptr;
    }

    const int rate = ctx->sample_rate;
    const int channels = ctx->ch_layout.nb_channels;

    SwrContext* swr = nullptr;
    AVChannelLayout out_layout;
    av_channel_layout_default(&out_layout, channels);
    if (swr_alloc_set_opts2(&swr, &out_layout, AV_SAMPLE_FMT_FLT, rate,
                            &ctx->ch_layout, ctx->sample_fmt, rate, 0,
                            nullptr) < 0 ||
        swr_init(swr) < 0) {
        LOGE("swr init failed\n");
        avcodec_free_context(&ctx);
        avformat_close_input(&fmt);
        return nullptr;
    }

    std::vector<float> pcm;
    AVPacket* pkt = av_packet_alloc();
    AVFrame* frame = av_frame_alloc();
    std::vector<float> tmp;

    auto drain_frame = [&](AVFrame* f) {
        int max_out = swr_get_out_samples(swr, f ? f->nb_samples : 0);
        if (max_out <= 0) max_out = 4096;
        tmp.resize((size_t)max_out * channels);
        uint8_t* outp = reinterpret_cast<uint8_t*>(tmp.data());
        int got = swr_convert(swr, &outp, max_out,
                              f ? const_cast<const uint8_t**>(f->data) : nullptr,
                              f ? f->nb_samples : 0);
        if (got > 0) pcm.insert(pcm.end(), tmp.begin(),
                                tmp.begin() + (size_t)got * channels);
    };

    while (av_read_frame(fmt, pkt) >= 0) {
        if (pkt->stream_index == sidx) {
            if (avcodec_send_packet(ctx, pkt) == 0) {
                while (avcodec_receive_frame(ctx, frame) == 0) {
                    drain_frame(frame);
                }
            }
        }
        av_packet_unref(pkt);
    }
    // flush decoder then resampler
    avcodec_send_packet(ctx, nullptr);
    while (avcodec_receive_frame(ctx, frame) == 0) drain_frame(frame);
    drain_frame(nullptr);

    av_frame_free(&frame);
    av_packet_free(&pkt);
    swr_free(&swr);
    avcodec_free_context(&ctx);
    avformat_close_input(&fmt);

    *out_rate = rate;
    *out_channels = channels;
    *out_frames = (long long)(pcm.size() / channels);
    float* out = (float*)std::malloc(pcm.size() * sizeof(float));
    std::memcpy(out, pcm.data(), pcm.size() * sizeof(float));
    return out;
}

extern "C" void MediaFreeBuffer(void* p) { std::free(p); }

// ---------------------------------------------------------------------------
// MP4 encoder (H.264 + AAC), threaded frame queue
// ---------------------------------------------------------------------------

struct Encoder {
    AVFormatContext* ofmt = nullptr;
    AVStream* vst = nullptr;
    AVCodecContext* vctx = nullptr;
    AVStream* ast = nullptr;
    AVCodecContext* actx = nullptr;
    SwsContext* sws = nullptr;
    int sws_src_w = 0, sws_src_h = 0;
    AVFrame* yuv = nullptr;
    AVPacket* pkt = nullptr;
    int width = 0, height = 0;
    double fps = 0.0;
    bool want_audio = false;
    bool audio_added = false;
    bool header_written = false;
    int64_t frame_index = 0;
    int error = 0;

    // Serializes all muxer/codec access between the encode worker and
    // EncAddAudio (which the API contract allows at any point before
    // EncFinish — it would otherwise race enc_write_header /
    // av_interleaved_write_frame on the shared AVFormatContext).
    std::mutex mux_mu;
    // While want_audio && !audio_added the header can't be written yet (an
    // MP4 stream set is fixed at write_header); encoded video packets wait
    // here, still in vctx time_base (stream time_base may change at header
    // write, so rescale happens at flush).
    std::vector<AVPacket*> vbuf;

    // worker thread + bounded queue of RGBA frames (w, h, data).
    // tile_w/tile_h != 0 marks a TILED frame (per-tile (NT, th*tw, 4)
    // layout straight off the TPU raster kernel, padded past w/h); the
    // worker detiles into `detile` scratch before encoding — off the
    // caller's critical path, overlapped with encode.
    std::thread worker;
    std::mutex mu;
    std::condition_variable cv_push, cv_pop;
    struct QFrame {
        int w, h;
        int tile_w = 0, tile_h = 0;
        std::vector<uint8_t> rgba;
    };
    std::deque<QFrame> queue;
    std::vector<uint8_t> detile;
    bool closing = false;
    static constexpr size_t kMaxQueue = 8;
};

// Detile a per-tile RGBA frame: src is (nty, ntx, tile_h, tile_w, 4)
// u8 with nty/ntx = ceil(h/th), ceil(w/tw); dst is (h, w, 4) raster
// order.  Padded slots (x >= w or y >= h) are dropped.  Matches
// raster3d.detile_u8_host / the tiled=True kernel layout exactly.
extern "C" void MediaDetileU8(void* dst_, const void* src_, long long w,
                              long long h, long long tile_w,
                              long long tile_h) {
    uint8_t* dst = (uint8_t*)dst_;
    const uint8_t* src = (const uint8_t*)src_;
    const long long ntx = (w + tile_w - 1) / tile_w;
    const size_t tile_bytes = (size_t)tile_h * tile_w * 4;
    const size_t row_bytes = (size_t)tile_w * 4;
    for (long long ty = 0; ty * tile_h < h; ty++) {
        const long long rows =
            tile_h < h - ty * tile_h ? tile_h : h - ty * tile_h;
        for (long long tx = 0; tx < ntx; tx++) {
            const uint8_t* st = src + ((size_t)(ty * ntx + tx)) * tile_bytes;
            const long long cols =
                tile_w < w - tx * tile_w ? tile_w : w - tx * tile_w;
            uint8_t* d0 = dst + (((size_t)ty * tile_h) * w + tx * tile_w) * 4;
            for (long long r = 0; r < rows; r++)
                std::memcpy(d0 + (size_t)r * w * 4, st + (size_t)r * row_bytes,
                            (size_t)cols * 4);
        }
    }
}

static int enc_write_header(Encoder* e) {
    if (e->header_written) return 0;
    int ret = 0;
    if (!(e->ofmt->oformat->flags & AVFMT_NOFILE)) {
        ret = avio_open(&e->ofmt->pb, e->ofmt->url, AVIO_FLAG_WRITE);
        if (ret < 0) {
            LOGE("avio_open: %s\n", err2str(ret));
            return ret;
        }
    }
    ret = avformat_write_header(e->ofmt, nullptr);
    if (ret < 0) {
        LOGE("write_header: %s\n", err2str(ret));
        return ret;
    }
    e->header_written = true;
    return 0;
}

static void enc_encode_rgba(Encoder* e, const uint8_t* rgba, int sw, int sh);

// Write any header-deferred video packets.  Caller holds mux_mu and has
// written the header.
static void enc_flush_vbuf(Encoder* e) {
    for (AVPacket*& p : e->vbuf) {
        av_packet_rescale_ts(p, e->vctx->time_base, e->vst->time_base);
        p->stream_index = e->vst->index;
        av_interleaved_write_frame(e->ofmt, p);
        av_packet_free(&p);
    }
    e->vbuf.clear();
}

static void enc_worker(Encoder* e) {
    for (;;) {
        Encoder::QFrame f;
        {
            std::unique_lock<std::mutex> lk(e->mu);
            e->cv_pop.wait(lk, [&] { return e->closing || !e->queue.empty(); });
            if (e->queue.empty()) {
                if (e->closing) return;
                continue;
            }
            f = std::move(e->queue.front());
            e->queue.pop_front();
            e->cv_push.notify_one();
        }
        if (f.tile_w) {
            e->detile.resize((size_t)f.w * f.h * 4);
            MediaDetileU8(e->detile.data(), f.rgba.data(), f.w, f.h,
                          f.tile_w, f.tile_h);
            enc_encode_rgba(e, e->detile.data(), f.w, f.h);
        } else {
            enc_encode_rgba(e, f.rgba.data(), f.w, f.h);
        }
    }
}

extern "C" void* EncCreate(const char* path, long long width,
                           long long height, double frame_rate,
                           long long has_audio) {
    Encoder* e = new Encoder();
    e->width = (int)width;
    e->height = (int)height;
    e->fps = frame_rate;
    e->want_audio = has_audio != 0;

    int ret = avformat_alloc_output_context2(&e->ofmt, nullptr, nullptr, path);
    if (ret < 0 || !e->ofmt) {
        LOGE("alloc_output_context2(%s): %s\n", path, err2str(ret));
        delete e;
        return nullptr;
    }

    const AVCodec* vcodec = avcodec_find_encoder(AV_CODEC_ID_H264);
    if (!vcodec) vcodec = avcodec_find_encoder(AV_CODEC_ID_MPEG4);
    if (!vcodec) {
        LOGE("no H.264/MPEG4 encoder\n");
        avformat_free_context(e->ofmt);
        delete e;
        return nullptr;
    }
    e->vctx = avcodec_alloc_context3(vcodec);
    e->vctx->width = e->width;
    e->vctx->height = e->height;
    e->vctx->time_base = {1, 90000};
    e->vctx->framerate = av_d2q(frame_rate, 1 << 16);
    e->vctx->pix_fmt = AV_PIX_FMT_YUV420P;
    e->vctx->gop_size = (int)(frame_rate + 0.5);
    e->vctx->max_b_frames = 2;
    e->vctx->thread_count = 0;  // auto
    if (e->ofmt->oformat->flags & AVFMT_GLOBALHEADER)
        e->vctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    av_opt_set(e->vctx->priv_data, "preset", "veryfast", 0);
    av_opt_set(e->vctx->priv_data, "crf", "20", 0);

    if ((ret = avcodec_open2(e->vctx, vcodec, nullptr)) < 0) {
        LOGE("video avcodec_open2: %s\n", err2str(ret));
        avcodec_free_context(&e->vctx);
        avformat_free_context(e->ofmt);
        delete e;
        return nullptr;
    }
    e->vst = avformat_new_stream(e->ofmt, vcodec);
    avcodec_parameters_from_context(e->vst->codecpar, e->vctx);
    e->vst->time_base = e->vctx->time_base;
    e->vst->avg_frame_rate = e->vctx->framerate;

    e->yuv = av_frame_alloc();
    e->yuv->format = AV_PIX_FMT_YUV420P;
    e->yuv->width = e->width;
    e->yuv->height = e->height;
    av_frame_get_buffer(e->yuv, 0);
    e->pkt = av_packet_alloc();

    e->worker = std::thread(enc_worker, e);
    return e;
}

// Encode the entire audio clip up front (the reference does the same inside
// InitializeVideoCap, cpp:150-193).  Interleaved f32 in, AAC out.
extern "C" int EncAddAudio(void* handle, const void* pcm_f32, long long rate,
                           long long channels, long long num_frames,
                           long long bit_rate) {
    Encoder* e = (Encoder*)handle;
    if (!e) return 2;
    // Serialize against the encode worker: both sides touch the muxer.
    std::lock_guard<std::mutex> lk(e->mux_mu);
    if (e->header_written) return 2;  // stream set is fixed at write_header
    const float* pcm = (const float*)pcm_f32;

    const AVCodec* acodec = avcodec_find_encoder(AV_CODEC_ID_AAC);
    if (!acodec) return 3;
    e->actx = avcodec_alloc_context3(acodec);
    e->actx->sample_fmt = AV_SAMPLE_FMT_FLTP;
    e->actx->bit_rate = bit_rate;
    e->actx->sample_rate = (int)rate;
    av_channel_layout_default(&e->actx->ch_layout, (int)channels);
    e->actx->time_base = {1, (int)rate};
    if (e->ofmt->oformat->flags & AVFMT_GLOBALHEADER)
        e->actx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;

    int ret = avcodec_open2(e->actx, acodec, nullptr);
    if (ret < 0) {
        LOGE("audio avcodec_open2: %s\n", err2str(ret));
        return 4;
    }
    e->ast = avformat_new_stream(e->ofmt, acodec);
    avcodec_parameters_from_context(e->ast->codecpar, e->actx);
    e->ast->time_base = e->actx->time_base;

    if ((ret = enc_write_header(e)) < 0) return 5;
    e->audio_added = true;
    enc_flush_vbuf(e);  // video packets that waited for the header

    const int fsz = e->actx->frame_size > 0 ? e->actx->frame_size : 1024;
    int64_t apts = 0;

    // Own packet: e->pkt belongs to the video path.
    AVPacket* apkt = av_packet_alloc();
    auto drain = [&]() {
        while (avcodec_receive_packet(e->actx, apkt) == 0) {
            av_packet_rescale_ts(apkt, e->actx->time_base,
                                 e->ast->time_base);
            apkt->stream_index = e->ast->index;
            av_interleaved_write_frame(e->ofmt, apkt);
            av_packet_unref(apkt);
        }
    };

    for (long long off = 0; off < num_frames; off += fsz) {
        AVFrame* f = av_frame_alloc();
        f->format = e->actx->sample_fmt;
        av_channel_layout_copy(&f->ch_layout, &e->actx->ch_layout);
        f->sample_rate = (int)rate;
        f->nb_samples = fsz;
        if (av_frame_get_buffer(f, 0) < 0) {
            av_frame_free(&f);
            av_packet_free(&apkt);
            return 6;
        }
        const long long avail = num_frames - off;
        for (long long c = 0; c < channels; ++c) {
            float* dst = (float*)f->data[c];
            for (int i = 0; i < fsz; ++i) {
                // zero-pad the tail instead of dropping it (ref cpp:153)
                dst[i] = (i < avail) ? pcm[(off + i) * channels + c] : 0.0f;
            }
        }
        f->pts = apts;
        apts += fsz;
        avcodec_send_frame(e->actx, f);
        drain();
        av_frame_free(&f);
    }
    avcodec_send_frame(e->actx, nullptr);
    drain();
    av_packet_free(&apkt);
    return 0;
}

static void enc_encode_rgba(Encoder* e, const uint8_t* rgba, int sw, int sh) {
    std::lock_guard<std::mutex> lk(e->mux_mu);
    if (e->error) return;
    // Audio was promised but hasn't arrived: the header (which fixes the
    // stream set) must wait, so encoded video packets are buffered in vbuf
    // until EncAddAudio writes it.
    const bool defer = e->want_audio && !e->audio_added;
    if (!defer && !e->header_written) {
        if (enc_write_header(e) < 0) {
            e->error = 1;
            return;
        }
    }
    if (!e->sws || e->sws_src_w != sw || e->sws_src_h != sh) {
        if (e->sws) sws_freeContext(e->sws);
        e->sws = sws_getContext(sw, sh, AV_PIX_FMT_RGBA, e->width, e->height,
                                AV_PIX_FMT_YUV420P, SWS_BILINEAR, nullptr,
                                nullptr, nullptr);
        e->sws_src_w = sw;
        e->sws_src_h = sh;
    }
    av_frame_make_writable(e->yuv);
    const uint8_t* src[1] = {rgba};
    const int stride[1] = {sw * 4};
    sws_scale(e->sws, src, stride, 0, sh, e->yuv->data, e->yuv->linesize);
    // Zero the linesize-alignment pad columns AFTER the convert, every
    // frame: make_writable allocates a fresh (uninitialized) buffer
    // whenever the encoder still holds a reference (every frame after
    // the first), sws_scale's SIMD tails can spill garbage into the
    // pad, and the H.264 encoder's edge extension reads it.  Without
    // this, identical frame inputs produced byte-different MP4s
    // depending on heap history (caught by tests/test_media.py
    // mesh-pipeline MP4 parity).
    {
        const int ph[3] = {e->height, (e->height + 1) / 2,
                           (e->height + 1) / 2};
        const int pw[3] = {e->width, (e->width + 1) / 2,
                           (e->width + 1) / 2};
        for (int p = 0; p < 3; ++p) {
            const int ls = e->yuv->linesize[p];
            if (ls <= pw[p]) continue;
            uint8_t* d = e->yuv->data[p];
            for (int r = 0; r < ph[p]; ++r)
                std::memset(d + (size_t)r * ls + pw[p], 0,
                            (size_t)(ls - pw[p]));
        }
    }
    e->yuv->pts = llround((double)e->frame_index * 90000.0 / e->fps);
    e->frame_index++;

    int ret = avcodec_send_frame(e->vctx, e->yuv);
    if (ret < 0) {
        LOGE("send_frame: %s\n", err2str(ret));
        e->error = 1;
        return;
    }
    while (avcodec_receive_packet(e->vctx, e->pkt) == 0) {
        if (defer) {
            AVPacket* cp = av_packet_alloc();
            av_packet_move_ref(cp, e->pkt);
            e->vbuf.push_back(cp);
            continue;
        }
        av_packet_rescale_ts(e->pkt, e->vctx->time_base, e->vst->time_base);
        e->pkt->stream_index = e->vst->index;
        av_interleaved_write_frame(e->ofmt, e->pkt);
        av_packet_unref(e->pkt);
    }
}

extern "C" int EncPutFrame(void* handle, const void* rgba, long long src_w,
                           long long src_h) {
    Encoder* e = (Encoder*)handle;
    if (!e) return 1;
    {
        std::unique_lock<std::mutex> lk(e->mu);
        e->cv_push.wait(lk, [&] { return e->queue.size() < Encoder::kMaxQueue; });
        Encoder::QFrame f;
        f.w = (int)src_w;
        f.h = (int)src_h;
        f.rgba.assign((const uint8_t*)rgba,
                      (const uint8_t*)rgba + (size_t)src_w * src_h * 4);
        e->queue.push_back(std::move(f));
        e->cv_pop.notify_one();
    }
    return e->error;
}

// Tiled-frame put: `tiles` is the TPU raster kernel's native per-tile
// u8 layout, (ceil(src_h/tile_h) * ceil(src_w/tile_w), tile_h*tile_w, 4).
// The detile (and viewport crop) runs in the encode worker thread,
// overlapping the next frame's render — the device never pays the
// detile transpose (exp_r4_champprof3: ~0.065 ms/frame at 1080p).
extern "C" int EncPutFrameTiled(void* handle, const void* tiles,
                                long long src_w, long long src_h,
                                long long tile_w, long long tile_h) {
    Encoder* e = (Encoder*)handle;
    if (!e) return 1;
    const long long ntx = (src_w + tile_w - 1) / tile_w;
    const long long nty = (src_h + tile_h - 1) / tile_h;
    const size_t nbytes = (size_t)(ntx * nty) * tile_w * tile_h * 4;
    {
        std::unique_lock<std::mutex> lk(e->mu);
        e->cv_push.wait(lk, [&] { return e->queue.size() < Encoder::kMaxQueue; });
        Encoder::QFrame f;
        f.w = (int)src_w;
        f.h = (int)src_h;
        f.tile_w = (int)tile_w;
        f.tile_h = (int)tile_h;
        f.rgba.assign((const uint8_t*)tiles, (const uint8_t*)tiles + nbytes);
        e->queue.push_back(std::move(f));
        e->cv_pop.notify_one();
    }
    return e->error;
}

extern "C" int EncFinish(void* handle) {
    Encoder* e = (Encoder*)handle;
    if (!e) return 1;
    {
        std::unique_lock<std::mutex> lk(e->mu);
        e->closing = true;
        e->cv_pop.notify_all();
    }
    if (e->worker.joinable()) e->worker.join();

    int rc = e->error;
    if (e->header_written || enc_write_header(e) == 0) {
        // promised audio never arrived: release the deferred video packets
        enc_flush_vbuf(e);
        // flush video encoder (ReleaseVideoCap semantics, cpp:198-230)
        avcodec_send_frame(e->vctx, nullptr);
        while (avcodec_receive_packet(e->vctx, e->pkt) == 0) {
            av_packet_rescale_ts(e->pkt, e->vctx->time_base,
                                 e->vst->time_base);
            e->pkt->stream_index = e->vst->index;
            av_interleaved_write_frame(e->ofmt, e->pkt);
            av_packet_unref(e->pkt);
        }
        av_write_trailer(e->ofmt);
    } else {
        rc = rc ? rc : 7;
    }

    for (AVPacket*& p : e->vbuf) av_packet_free(&p);  // header-write failure
    if (!(e->ofmt->oformat->flags & AVFMT_NOFILE) && e->ofmt->pb)
        avio_closep(&e->ofmt->pb);
    if (e->sws) sws_freeContext(e->sws);
    av_frame_free(&e->yuv);
    av_packet_free(&e->pkt);
    avcodec_free_context(&e->vctx);
    if (e->actx) avcodec_free_context(&e->actx);
    avformat_free_context(e->ofmt);
    delete e;
    return rc;
}

// ---------------------------------------------------------------------------
// standalone audio-file encode (wav/mp3/m4a by extension)
// ---------------------------------------------------------------------------

extern "C" int MediaEncodeAudioFile(const char* path, const void* pcm_f32,
                                    long long rate, long long channels,
                                    long long num_frames,
                                    long long bit_rate) {
    const float* pcm = (const float*)pcm_f32;
    AVFormatContext* ofmt = nullptr;
    int ret = avformat_alloc_output_context2(&ofmt, nullptr, nullptr, path);
    if (ret < 0 || !ofmt) return 1;

    enum AVCodecID cid =
        av_guess_codec(ofmt->oformat, nullptr, path, nullptr,
                       AVMEDIA_TYPE_AUDIO);
    const AVCodec* codec = avcodec_find_encoder(cid);
    if (!codec) {
        avformat_free_context(ofmt);
        return 2;
    }
    AVCodecContext* ctx = avcodec_alloc_context3(codec);
    // pick a supported sample format (prefer float planar, else s16)
    const enum AVSampleFormat* fmts = codec->sample_fmts;
    enum AVSampleFormat fmt = fmts ? fmts[0] : AV_SAMPLE_FMT_FLTP;
    if (fmts) {
        for (const enum AVSampleFormat* f = fmts; *f != AV_SAMPLE_FMT_NONE;
             ++f) {
            if (*f == AV_SAMPLE_FMT_FLTP || *f == AV_SAMPLE_FMT_FLT) {
                fmt = *f;
                break;
            }
        }
    }
    ctx->sample_fmt = fmt;
    ctx->sample_rate = (int)rate;
    av_channel_layout_default(&ctx->ch_layout, (int)channels);
    ctx->time_base = {1, (int)rate};
    if (bit_rate > 0) ctx->bit_rate = bit_rate;
    if (ofmt->oformat->flags & AVFMT_GLOBALHEADER)
        ctx->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    if ((ret = avcodec_open2(ctx, codec, nullptr)) < 0) {
        LOGE("audio-file open2: %s\n", err2str(ret));
        avcodec_free_context(&ctx);
        avformat_free_context(ofmt);
        return 3;
    }
    AVStream* st = avformat_new_stream(ofmt, codec);
    avcodec_parameters_from_context(st->codecpar, ctx);
    st->time_base = ctx->time_base;

    if (!(ofmt->oformat->flags & AVFMT_NOFILE)) {
        if (avio_open(&ofmt->pb, path, AVIO_FLAG_WRITE) < 0) {
            avcodec_free_context(&ctx);
            avformat_free_context(ofmt);
            return 4;
        }
    }
    if (avformat_write_header(ofmt, nullptr) < 0) {
        avcodec_free_context(&ctx);
        avformat_free_context(ofmt);
        return 5;
    }

    SwrContext* swr = nullptr;
    AVChannelLayout layout;
    av_channel_layout_default(&layout, (int)channels);
    swr_alloc_set_opts2(&swr, &layout, fmt, (int)rate, &layout,
                        AV_SAMPLE_FMT_FLT, (int)rate, 0, nullptr);
    swr_init(swr);

    AVPacket* pkt = av_packet_alloc();
    const int fsz = ctx->frame_size > 0 ? ctx->frame_size : 1024;
    int64_t pts = 0;
    auto drain = [&]() {
        while (avcodec_receive_packet(ctx, pkt) == 0) {
            av_packet_rescale_ts(pkt, ctx->time_base, st->time_base);
            pkt->stream_index = st->index;
            av_interleaved_write_frame(ofmt, pkt);
            av_packet_unref(pkt);
        }
    };
    std::vector<float> padded((size_t)fsz * channels, 0.0f);
    for (long long off = 0; off < num_frames; off += fsz) {
        AVFrame* f = av_frame_alloc();
        f->format = fmt;
        av_channel_layout_copy(&f->ch_layout, &ctx->ch_layout);
        f->sample_rate = (int)rate;
        f->nb_samples = fsz;
        av_frame_get_buffer(f, 0);
        const long long avail = num_frames - off;
        const long long n = avail < fsz ? avail : fsz;
        std::fill(padded.begin(), padded.end(), 0.0f);
        std::memcpy(padded.data(), pcm + off * channels,
                    (size_t)n * channels * sizeof(float));
        const uint8_t* in = reinterpret_cast<const uint8_t*>(padded.data());
        swr_convert(swr, f->data, fsz, &in, fsz);
        f->pts = pts;
        pts += fsz;
        avcodec_send_frame(ctx, f);
        drain();
        av_frame_free(&f);
    }
    avcodec_send_frame(ctx, nullptr);
    drain();
    av_write_trailer(ofmt);
    if (!(ofmt->oformat->flags & AVFMT_NOFILE) && ofmt->pb)
        avio_closep(&ofmt->pb);
    av_packet_free(&pkt);
    swr_free(&swr);
    avcodec_free_context(&ctx);
    avformat_free_context(ofmt);
    return 0;
}
