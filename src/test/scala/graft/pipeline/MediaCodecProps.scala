package graft.pipeline

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

import MediaCodec._

/** ScalaCheck invariants over the real codecs: container round-trips are
  * lossless, the perceptual hash is container-independent, resize respects
  * its exact-integer-mean contract, and the banded featurizers agree with a
  * direct fold — on RANDOM geometry and pixels, not just the handcrafted
  * spec fixtures.
  */
object MediaCodecProps extends Properties("mediacodec") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(30)

  private val imageGen: Gen[RasterImage] = for {
    w <- Gen.choose(1, 12)
    h <- Gen.choose(1, 12)
    rgb <- Gen.listOfN(w * h * 3, Gen.choose(0, 255))
  } yield RasterImage(w, h, rgb.map(_.toByte).toArray)

  property("PPM encode-decode round-trip is lossless") = forAll(imageGen) { img =>
    val rt = decodePpm(encodePpm(img))
    rt.width == img.width && rt.height == img.height &&
      rt.rgb.toSeq == img.rgb.toSeq
  }

  property("16-bit PPM at maxval 65535 inverts the v8 * 257 deepening exactly") =
    forAll(imageGen) { img =>
      // widen every 8-bit sample to 16-bit via v * 257 (= v * 65535 / 255,
      // the canonical deepening); the decoder's v * 255 / 65535 must give
      // the original back bit-for-bit
      val header = s"P6\n${img.width} ${img.height}\n65535\n".getBytes("US-ASCII")
      val wide = img.rgb.flatMap { b =>
        val v = (b & 0xff) * 257
        Seq(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
      }
      val rt = decodePpm(header ++ wide)
      rt.width == img.width && rt.rgb.toSeq == img.rgb.toSeq
    }

  property("P5 gray decodes to the replicated-RGB P6 of the same samples (8- and 16-bit)") =
    forAll(Gen.choose(1, 12), Gen.choose(1, 12)) { (w, h) =>
      forAll(Gen.listOfN(w * h, Gen.choose(0, 255))) { gs =>
        val gray = gs.map(_.toByte).toArray
        val rgb = gray.flatMap(g => Array(g, g, g))
        val p5 = decodePgm(s"P5\n$w $h\n255\n".getBytes("US-ASCII") ++ gray)
        val p6 = decodePpm(s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb)
        val wide = gray.flatMap { b => // canonical deepening, as the PPM prop
          val v = (b & 0xff) * 257
          Seq(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        }
        val p5deep = decodePgm(s"P5\n$w $h\n65535\n".getBytes("US-ASCII") ++ wide)
        p5.rgb.toSeq == p6.rgb.toSeq && p5deep.rgb.toSeq == p6.rgb.toSeq &&
          ahash64(p5) == ahash64(p6)
      }
    }

  property("ahash64 sees pixels, not containers (PPM round-trip preserves it)") =
    forAll(imageGen) { img =>
      ahash64(img) == ahash64(decodePpm(encodePpm(img)))
    }

  property("same-size resize is the identity") = forAll(imageGen) { img =>
    resize(img, img.width, img.height).rgb.toSeq == img.rgb.toSeq
  }

  property("resize output pixels are exact integer box means, within [min, max] of the box") =
    forAll(imageGen, Gen.choose(1, 12), Gen.choose(1, 12)) { (img, w, h) =>
      val out = resize(img, w, h)
      (0 until h).forall { y =>
        val (sy0, sy1raw) = ((y.toLong * img.height / h).toInt,
          ((y + 1).toLong * img.height / h).toInt)
        val sy1 = math.max(sy1raw, sy0 + 1)
        (0 until w).forall { x =>
          val (sx0, sx1raw) = ((x.toLong * img.width / w).toInt,
            ((x + 1).toLong * img.width / w).toInt)
          val sx1 = math.max(sx1raw, sx0 + 1)
          (0 until 3).forall { c =>
            val box = for (sy <- sy0 until sy1; sx <- sx0 until sx1)
              yield img.rgb(3 * (sy * img.width + sx) + c) & 0xff
            val got = out.rgb(3 * (y * w + x) + c) & 0xff
            got == box.map(_.toLong).sum / box.size &&
              got >= box.min - 1 && got <= box.max // truncating mean
          }
        }
      }
    }

  property("bandedLuma equals a direct per-band fold at every dim") =
    forAll(imageGen, Gen.choose(1, 8)) { (img, dim) =>
      val got = bandedLuma(img, dim)
      val n = img.pixelCount
      (0 until dim).forall { k =>
        val (s, e) = ((k.toLong * n / dim).toInt, ((k + 1).toLong * n / dim).toInt)
        val expect =
          if (e <= s) 0f
          else ((s until e).map(i => img.rgbSum(i).toLong).sum / (3.0 * 255.0 * (e - s))).toFloat
        got(k) == expect
      }
    }

  private val wavGen: Gen[(Int, Array[Byte])] = for {
    n <- Gen.choose(0, 64)
    rate <- Gen.choose(1, 48000)
    samples <- Gen.listOfN(n, Gen.choose(0, 255))
  } yield (rate, samples.map(_.toByte).toArray)

  property("WAV header-build + decode round-trip is lossless at any rate/length") =
    forAll(wavGen) { case (rate, samples) =>
      val got = decodeWav(wavHeader(samples.length, rate) ++ samples)
      got.sampleRate == rate && got.bits == 8 &&
        got.samples.toSeq == samples.map(_ & 0xff).toSeq
    }

  private val wav16Gen: Gen[(Int, List[Int])] = for {
    n <- Gen.choose(0, 48)
    rate <- Gen.choose(1, 48000)
    samples <- Gen.listOfN(n, Gen.choose(-32768, 32767))
  } yield (rate, samples)

  private def le16bytes(vs: Seq[Int]): Array[Byte] =
    vs.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray

  property("16-bit WAV round-trip is lossless over the full signed range") =
    forAll(wav16Gen) { case (rate, samples) =>
      val got = decodeWav(wavHeaderPcm(samples.length, rate, 1, 16) ++ le16bytes(samples))
      got.sampleRate == rate && got.bits == 16 && got.samples.toSeq == samples
    }

  property("stereo decode equals the floor mean of the per-channel decodes") =
    forAll(wav16Gen) { case (rate, mono) =>
      // interleave (s, -s-1): an asymmetric pair whose sum is always -1,
      // so every frame exercises the negative-odd floor case
      val frames = mono.map(s => (s, if (s == 32767) -32768 else -s - 1))
      val inter = le16bytes(frames.flatMap { case (l, r) => Seq(l, r) })
      val got = decodeWav(wavHeaderPcm(frames.length, rate, 2, 16) ++ inter)
      got.samples.toSeq == frames.map { case (l, r) => (l + r) >> 1 }
    }

  property("PNG encode(real zlib, random filters)-decode round-trip is lossless, all color types") =
    forAll(Gen.choose(1, 9), Gen.choose(1, 9), Gen.oneOf(0, 2, 6), Gen.long) {
      (w, h, colorType, seed) =>
        val ch = colorType match { case 2 => 3; case 6 => 4; case _ => 1 }
        val rnd = new scala.util.Random(seed)
        val px = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
        val file = MediaCodecSpec.pngFile(w, h, colorType, px, _ => rnd.nextInt(5))
        val got = decodePng(file)
        val expect = colorType match {
          case 0 => px.flatMap(g => Seq(g, g, g))
          case 2 => px
          case _ => px.grouped(4).flatMap(_.take(3)).toArray
        }
        got.width == w && got.height == h && got.rgb.toSeq == expect.toSeq
    }

  private val wav24Gen: Gen[(Int, List[Int])] = for {
    n <- Gen.choose(0, 48)
    rate <- Gen.choose(1, 48000)
    samples <- Gen.listOfN(n, Gen.choose(-8388608, 8388607))
  } yield (rate, samples)

  property("24-bit WAV round-trip is lossless over the full signed range") =
    forAll(wav24Gen) { case (rate, samples) =>
      val bytes = samples.flatMap(v => Seq((v & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte)).toArray
      val got = decodeWav(wavHeaderPcm(samples.length, rate, 1, 24) ++ bytes)
      got.sampleRate == rate && got.bits == 24 && got.samples.toSeq == samples
    }

  property("float32 WAV quantization inverts v/32768f exactly over the 16-bit grid") =
    forAll(wav16Gen) { case (rate, grid) =>
      // v/32768f is exact in float32 (16-bit value over a power of two), so
      // the decoder's trunc(f * 32768) must give back exactly v
      val bytes = grid.flatMap { v =>
        val b = java.lang.Float.floatToIntBits(v / 32768.0f)
        Seq((b & 0xff).toByte, ((b >> 8) & 0xff).toByte,
          ((b >> 16) & 0xff).toByte, ((b >> 24) & 0xff).toByte)
      }.toArray
      val got = decodeWav(wavHeaderPcm(grid.length, rate, 1, 32, formatTag = 3) ++ bytes)
      got.sampleRate == rate && got.bits == 32 && got.samples.toSeq == grid
    }

  property("masked-exponent float bytes decode finite and quantize within the clamp") =
    forAll(Gen.listOfN(16, Gen.choose(0, 255)), Gen.choose(1, 48000)) { (raw, rate) =>
      // the mm_real_audio_deep fixture discipline: any 4 bytes with the MSB
      // masked & 0xBF form a finite float with |f| < 2 — decode must accept
      // and land inside the clamp rails for EVERY byte pattern
      val bs = raw.grouped(4).filter(_.size == 4).toList
      val bytes = bs.flatMap { g =>
        Seq(g(0).toByte, g(1).toByte, g(2).toByte, (g(3) & 0xBF).toByte)
      }.toArray
      val got = decodeWav(wavHeaderPcm(bs.length, rate, 1, 32, formatTag = 3) ++ bytes)
      got.samples.forall(s => s >= -32768 && s <= 32767)
    }

  property("C420 build + decode normalizes to the nearest-upsampled C444 planes") =
    forAll(Gen.choose(1, 3), Gen.choose(1, 3), Gen.choose(1, 3)) { (hw, hh, nf) =>
      val (w, h) = (2 * hw, 2 * hh)
      val rnd = new scala.util.Random(w * 131 + h * 17 + nf)
      val frames = Seq.fill(nf)(Array.fill(w * h * 3 / 2)(rnd.nextInt(256).toByte))
      val bytes = y4mHeader(w, h, "C420") ++
        frames.flatMap(f => "FRAME\n".getBytes("US-ASCII") ++ f)
      val clip = decodeY4m(bytes.toArray)
      clip.width == w && clip.height == h && clip.frames.length == nf &&
        frames.indices.forall { i =>
          val f = frames(i)
          val n = w * h
          clip.yPlane(i).toSeq == f.take(n).toSeq &&
            (0 until n).forall { p =>
              val (x, y) = (p % w, p / w)
              val q = (y >> 1) * (w / 2) + (x >> 1)
              clip.uPlane(i)(p) == f(n + q) && clip.vPlane(i)(p) == f(n + n / 4 + q)
            }
        }
    }

  property("C422/C411 build + decode normalize to horizontally-upsampled C444 planes") =
    forAll(Gen.oneOf(2, 4), Gen.choose(1, 4), Gen.choose(1, 4), Gen.choose(1, 3)) {
      (sx, wq, h, nf) =>
        val w = sx * wq
        val chroma = if (sx == 2) "C422" else "C411"
        val rnd = new scala.util.Random(w * 131 + h * 17 + nf + sx)
        val frameLen = w * h + 2 * (w / sx) * h
        val frames = Seq.fill(nf)(Array.fill(frameLen)(rnd.nextInt(256).toByte))
        val bytes = y4mHeader(w, h, chroma) ++
          frames.flatMap(f => "FRAME\n".getBytes("US-ASCII") ++ f)
        val clip = decodeY4m(bytes.toArray)
        val n = w * h
        val cn = (w / sx) * h
        clip.frames.length == nf && frames.indices.forall { i =>
          val f = frames(i)
          clip.yPlane(i).toSeq == f.take(n).toSeq &&
            (0 until n).forall { p =>
              val (x, y) = (p % w, p / w)
              val q = y * (w / sx) + x / sx
              clip.uPlane(i)(p) == f(n + q) && clip.vPlane(i)(p) == f(n + cn + q)
            }
        }
    }

  property("Y4M build + decode round-trip preserves every frame") =
    forAll(Gen.choose(1, 6), Gen.choose(1, 6), Gen.choose(0, 4)) { (w, h, nf) =>
      val rnd = new scala.util.Random(w * 31 + h * 7 + nf)
      val frames = Seq.fill(nf)(Array.fill(3 * w * h)(rnd.nextInt(256).toByte))
      val bytes = y4mHeader(w, h) ++
        frames.flatMap(f => "FRAME\n".getBytes("US-ASCII") ++ f)
      val clip = decodeY4m(bytes.toArray)
      clip.width == w && clip.height == h && clip.frames.length == nf &&
        clip.frames.zip(frames).forall { case (a, b) => a.toSeq == b.toSeq }
    }

  // ---- EXIF orientation group laws (mm_ahash_oriented's transform) ----

  private def same(a: MediaCodec.RasterImage, b: MediaCodec.RasterImage): Boolean =
    a.width == b.width && a.height == b.height && a.rgb.toSeq == b.rgb.toSeq

  property("orientation involutions: 2, 3, 4, 5, 7 applied twice are identity") =
    forAll(imageGen, Gen.oneOf(2, 3, 4, 5, 7)) { (img, o) =>
      same(applyOrientation(applyOrientation(img, o), o), img)
    }

  property("orientation rotations: 6 then 8 and 8 then 6 are identity; 6 twice is 3") =
    forAll(imageGen) { img =>
      same(applyOrientation(applyOrientation(img, 6), 8), img) &&
        same(applyOrientation(applyOrientation(img, 8), 6), img) &&
        same(applyOrientation(applyOrientation(img, 6), 6), applyOrientation(img, 3))
    }

  property("orientation preserves the pixel multiset (it only moves pixels)") =
    forAll(imageGen, Gen.choose(1, 8)) { (img, o) =>
      def pixels(r: MediaCodec.RasterImage): Seq[(Int, Int, Int)] =
        r.rgb.grouped(3).map(p => (p(0) & 0xff, p(1) & 0xff, p(2) & 0xff)).toSeq.sorted
      pixels(applyOrientation(img, o)) == pixels(img)
    }
}
