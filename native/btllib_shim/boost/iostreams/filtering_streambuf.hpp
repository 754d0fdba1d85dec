// boost::iostreams-compat shim (gzip input path only).
//
// /root/reference/ntedit.cpp uses exactly this surface to read a gzipped
// annotation VCF (ntedit.cpp:2535-2550): filtering_streambuf<input>,
// push(gzip_decompressor()), push(std::istream&), then std::istream over
// the streambuf + std::getline.  Implemented over zlib's inflate with the
// gzip window (15+16).  boost itself is not installed in this environment.
#ifndef BOOST_IOSTREAMS_FILTERING_STREAMBUF_HPP
#define BOOST_IOSTREAMS_FILTERING_STREAMBUF_HPP

#include <cstring>
#include <istream>
#include <stdexcept>
#include <streambuf>
#include <vector>

#include <zlib.h>

namespace boost {
namespace iostreams {

struct input
{};

class gzip_decompressor
{};

template<typename Mode>
class filtering_streambuf : public std::streambuf
{
  public:
	filtering_streambuf() = default;

	~filtering_streambuf() override
	{
		if (z_init_)
			inflateEnd(&z_);
	}

	void push(const gzip_decompressor&) { gz_ = true; }

	void push(std::istream& src)
	{
		src_ = &src;
		if (gz_) {
			std::memset(&z_, 0, sizeof(z_));
			if (inflateInit2(&z_, 15 + 16) != Z_OK)
				throw std::runtime_error("boost shim: inflateInit2 failed");
			z_init_ = true;
		}
		in_.resize(1 << 16);
		out_.resize(1 << 16);
		setg(out_.data(), out_.data(), out_.data());
	}

  protected:
	int_type underflow() override
	{
		if (gptr() < egptr())
			return traits_type::to_int_type(*gptr());
		if (src_ == nullptr)
			return traits_type::eof();
		if (!gz_) { // pass-through (unused by the reference, kept for symmetry)
			src_->read(out_.data(), (std::streamsize)out_.size());
			std::streamsize n = src_->gcount();
			if (n <= 0)
				return traits_type::eof();
			setg(out_.data(), out_.data(), out_.data() + n);
			return traits_type::to_int_type(*gptr());
		}
		z_.next_out = reinterpret_cast<Bytef*>(out_.data());
		z_.avail_out = (uInt)out_.size();
		while (z_.avail_out == (uInt)out_.size()) {
			if (z_.avail_in == 0 && !src_eof_) {
				src_->read(in_.data(), (std::streamsize)in_.size());
				std::streamsize n = src_->gcount();
				if (n <= 0)
					src_eof_ = true;
				z_.next_in = reinterpret_cast<Bytef*>(in_.data());
				z_.avail_in = (uInt)(n > 0 ? n : 0);
			}
			int rc = inflate(&z_, src_eof_ ? Z_FINISH : Z_NO_FLUSH);
			if (rc == Z_STREAM_END) {
				// support concatenated gzip members
				if (z_.avail_in > 0)
					inflateReset(&z_);
				else
					break;
			} else if (rc != Z_OK && rc != Z_BUF_ERROR) {
				throw std::runtime_error("boost shim: gzip inflate error");
			} else if (rc == Z_BUF_ERROR && src_eof_ && z_.avail_in == 0) {
				break;
			}
		}
		std::streamsize produced = (std::streamsize)(out_.size() - z_.avail_out);
		if (produced <= 0)
			return traits_type::eof();
		setg(out_.data(), out_.data(), out_.data() + produced);
		return traits_type::to_int_type(*gptr());
	}

  private:
	std::istream* src_ = nullptr;
	bool gz_ = false;
	bool gz_done_ = false;
	bool src_eof_ = false;
	bool z_init_ = false;
	z_stream z_{};
	std::vector<char> in_;
	std::vector<char> out_;
};

} // namespace iostreams
} // namespace boost

#endif
