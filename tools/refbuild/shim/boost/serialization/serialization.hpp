// Minimal stand-in for boost/serialization used ONLY to compile the
// reference's serial A* binary for golden capture.  The serial path never
// serializes anything, so `access` just needs to exist for friend decls.
#pragma once
namespace boost { namespace serialization { class access {}; } }
