// boost::iostreams-compat shim: copy.hpp is included by the reference
// (ntedit.cpp:36) but boost::iostreams::copy is never called; provide the
// header so the unmodified translation unit compiles.
#ifndef BOOST_IOSTREAMS_COPY_HPP
#define BOOST_IOSTREAMS_COPY_HPP

#include <istream>
#include <ostream>

namespace boost {
namespace iostreams {

inline std::streamsize
copy(std::streambuf& src, std::ostream& dst)
{
	return dst << &src ? 0 : -1;
}

} // namespace iostreams
} // namespace boost

#endif
