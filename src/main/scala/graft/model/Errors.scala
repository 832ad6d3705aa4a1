package graft.model

/** Structured error taxonomy
  * (`/root/reference/src/error.rs:8-46`, `src/io/sentinel1.rs:20-35`,
  * `src/cli/errors.rs:5-31`): a library caller can catch by category
  * instead of string-matching messages, and the message templates match
  * the reference's `thiserror` formats verbatim so batch reports and CLI
  * output read the same.
  */
sealed abstract class GraftException(message: String) extends RuntimeException(message)

object GraftException {

  /** `Error::InvalidArgument` (`error.rs:20-21`). */
  final case class InvalidArgument(arg: String, value: String)
    extends GraftException(s"Invalid argument: $arg=$value")

  /** `Error::ZeroSize` / `AppError::ZeroSize` (`error.rs:23-24`). */
  final case class ZeroSize(size: Long)
    extends GraftException(s"Size must be greater than 0, got: $size")

  /** `Error::MissingArgument` (`error.rs:26-27`). */
  final case class MissingArgument(arg: String)
    extends GraftException(s"Missing required argument: $arg")

  /** `Error::IncompleteDataPair` (`error.rs:29-34`) — a band operation
    * whose inputs aren't all present; `available` lists what was found.
    */
  final case class IncompleteDataPair(operation: String, available: String)
    extends GraftException(
      s"No complete polarization data available for operation: $operation. Available: $available")

  /** `SafeError::UnsupportedProduct` (`sentinel1.rs:29-30`) — the batch
    * path counts this as SKIPPED, not an error.
    */
  final case class UnsupportedProduct(product: String)
    extends GraftException(s"Unsupported SAFE product type: $product")

  /** `SafeError::MissingField` (`sentinel1.rs:27-28`). */
  final case class MissingField(field: String)
    extends GraftException(s"Missing field `$field` in SAFE metadata")

  /** `SafeError::NotTiff` (`sentinel1.rs:33-34`). */
  final case class NotTiff(path: String)
    extends GraftException(s"Provided SLC measurement file is not a TIFF file: $path")

  /** `SafeError::Parse` (`sentinel1.rs:31-32`). */
  final case class ParseError(detail: String)
    extends GraftException(s"Parse error: $detail")

  /** `Error::Processing` (`error.rs:36-37`). */
  final case class Processing(detail: String)
    extends GraftException(s"Processing error: $detail")

  /** `Error::External` (`error.rs:39-40`, incl. the `external` helper). */
  final case class External(detail: String)
    extends GraftException(s"External error: $detail")
}
